import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnerf_tpu.models.network import Network, NetworkConfig
from occnerf_tpu.utils import body
from occnerf_tpu.smpl import synthetic_smpl_model


def _mini_network(canonical="core.nets.occnerf.canonical_mlps.occnerf_mlp"):
    cfg = NetworkConfig(
        n_samples=8, chunk=32, knn_backend="exact",
        canonical_module=canonical,
        cnl_mlp_depth=2, cnl_mlp_width=32,
        cnl_num_levels=4, cnl_log2_hashmap_size=10,
        cnl_base_resolution=4,
        mweight_embedding_size=32, mweight_volume_size=8,
        nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
        nr_kick_in_iter=10, nr_full_band_iter=100,
        pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
    return Network(cfg)


@pytest.fixture()
def setup(rng):
    model = synthetic_smpl_model(n_verts=128, seed=2)
    from occnerf_tpu.smpl.model import SMPL, save_model
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(model, os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    net = _mini_network()
    statics = net.generate_neural_points(verts, joints, smpl.faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    n_rays = 16
    lo = joints.min(0) - 0.3
    hi = joints.max(0) + 0.3
    priors = body.approx_gaussian_bone_volumes(joints, lo, hi, grid_size=8)
    Rs, Ts = body.body_pose_to_body_RTs(
        rng.normal(0, 0.1, 72).astype(np.float32), joints)
    batch = {
        "rays": jnp.asarray(np.stack([
            rng.normal(0, 0.1, (n_rays, 3)) + [0, 0, -3.0],
            np.tile([0, 0, 1.0], (n_rays, 1))
            + rng.normal(0, 0.05, (n_rays, 3))]).astype(np.float32)),
        "near": jnp.full((n_rays, 1), 2.0, jnp.float32),
        "far": jnp.full((n_rays, 1), 4.0, jnp.float32),
        "dst_Rs": jnp.asarray(Rs),
        "dst_Ts": jnp.asarray(Ts),
        "cnl_gtfms": jnp.asarray(body.get_canonical_global_tfms(joints)),
        "motion_weights_priors": jnp.asarray(priors),
        "dst_posevec": jnp.asarray(
            rng.normal(0, 0.1, 69).astype(np.float32)),
        "cnl_bbox_min_xyz": jnp.asarray(lo.astype(np.float32)),
        "cnl_bbox_scale_xyz": jnp.asarray(
            (2.0 / (hi - lo)).astype(np.float32)),
        "bgcolor": jnp.asarray([255.0, 255.0, 255.0]),
    }
    return net, params, state, statics, batch


def test_forward_train_shapes_and_state(setup):
    net, params, state, statics, batch = setup
    out, new_state = net.forward(params, statics, state, batch, 100.0,
                                 training=True, perturb=1.0,
                                 rng=jax.random.PRNGKey(1))
    assert out["rgb"].shape == (16, 3)
    assert out["alpha"].shape == (16,)
    assert out["depth"].shape == (16,)
    assert out["comp_loss"].shape == (16 * 8,)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # visibility counter either unchanged (gate) or incremented
    diff = np.asarray(new_state["point_counter"] - state["point_counter"])
    assert (diff >= 0).all()


def test_forward_eval_no_state_change(setup):
    net, params, state, statics, batch = setup
    out, new_state = net.forward(params, statics, state, batch, 1e7,
                                 training=False)
    assert "comp_loss" not in out
    np.testing.assert_array_equal(np.asarray(new_state["point_counter"]),
                                  np.asarray(state["point_counter"]))


def test_forward_chunked_matches_single(setup):
    net, params, state, statics, batch = setup
    out1, _ = net.forward(params, statics, state, batch, 1e7,
                          training=False, chunk=64)
    out2, _ = net.forward(params, statics, state, batch, 1e7,
                          training=False, chunk=8)  # 2 chunks of 8
    np.testing.assert_allclose(np.asarray(out1["rgb"]),
                               np.asarray(out2["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1["depth"]),
                               np.asarray(out2["depth"]), atol=1e-5)


def test_gradients_flow(setup):
    net, params, state, statics, batch = setup

    def loss(p):
        out, _ = net.forward(p, statics, state, batch, 100.0,
                             training=True, perturb=0.0)
        return jnp.mean(out["rgb"]) + jnp.mean(out["comp_loss"])

    g = jax.grad(loss)(params)
    flat = jax.tree.leaves(jax.tree.map(
        lambda x: jnp.isfinite(x).all(), g))
    assert all(bool(x) for x in flat)
    # the learnable per-point offset must receive gradient via the sdf path
    assert float(jnp.abs(g["point_dist"]).sum()) > 0
    # hash table must receive gradient
    assert float(jnp.abs(g["cnl_mlp"]["encoder"]).sum()) > 0


def test_pose_refiner_gating(setup):
    net, params, state, statics, batch = setup
    # make the refiner output large so gating is observable
    params = jax.tree.map(lambda x: x, params)
    params["pose_decoder"]["layers"][-1]["w"] = \
        params["pose_decoder"]["layers"][-1]["w"] + 0.5
    out_before, _ = net.forward(params, statics, state, batch, 10.0,
                                training=False)  # iter < kick_in 50
    out_after, _ = net.forward(params, statics, state, batch, 100.0,
                               training=False)
    assert not np.allclose(np.asarray(out_before["rgb"]),
                           np.asarray(out_after["rgb"]), atol=1e-5)


def test_vanilla_canonical_path(setup, rng):
    net_v = _mini_network("core.nets.occnerf.canonical_mlps.mlp_rgb_sigma")
    _, _, state, statics_o, batch = setup
    statics = net_v.generate_neural_points(
        np.asarray(statics_o["point_base"]),
        np.asarray(statics_o["point_base"][:24]),
        np.zeros((4, 3), np.int32))
    params, state = net_v.init(jax.random.PRNGKey(0), statics)
    out, _ = net_v.forward(params, statics, state, batch, 100.0,
                           training=True, perturb=0.0)
    assert out["rgb"].shape == (16, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_jit_forward(setup):
    net, params, state, statics, batch = setup

    @jax.jit
    def fwd(p, s, b):
        return net.forward(p, statics, s, b, 100.0, training=True,
                           perturb=0.0)

    out, new_state = fwd(params, state, batch)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_sample_compaction_exact(setup):
    """Compaction with K >= count(mask > 0) reproduces the full forward
    exactly (rgb/alpha/depth via the alpha-mask zeroing; comp_loss via the
    origin-probe correction)."""
    _, params, state, statics_small, batch = setup

    def make(frac):
        cfg = NetworkConfig(
            n_samples=64, chunk=32, knn_backend="exact",
            sample_compaction=frac,
            cnl_mlp_depth=2, cnl_mlp_width=32,
            cnl_num_levels=4, cnl_log2_hashmap_size=10,
            cnl_base_resolution=4,
            mweight_embedding_size=32, mweight_volume_size=8,
            nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
            nr_kick_in_iter=10, nr_full_band_iter=100,
            pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
        return Network(cfg)

    net_full, net_cmp = make(1.0), make(0.5)
    # rebuild statics/params on each net (cnl_mlp is built per instance).
    # Use a REAL synthetic mesh: all-zero faces give all-zero vertex
    # normals, whose 0/0 surface aggregation NaNs every gradient — and
    # assert_allclose treats NaN == NaN as equal, silently voiding the
    # gradient comparison below.
    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model as _ssm
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(_ssm(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))
    statics = net_full.generate_neural_points(verts, joints, smpl.faces)
    net_cmp.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_full.init(jax.random.PRNGKey(0), statics)

    # push rays so over half the samples fall outside the volume
    b = dict(batch)
    b["far"] = jnp.full_like(batch["far"], 10.0)

    out_f, st_f = net_full.forward(params, statics, state, b, 100.0,
                                   training=True, perturb=0.0)
    out_c, st_c = net_cmp.forward(params, statics, state, b, 100.0,
                                  training=True, perturb=0.0)
    np.testing.assert_allclose(np.asarray(out_f["rgb"]),
                               np.asarray(out_c["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["depth"]),
                               np.asarray(out_c["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["alpha"]),
                               np.asarray(out_c["alpha"]), atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(out_f["comp_loss"])),
        float(jnp.sum(out_c["comp_loss"])), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(st_f["point_counter"]),
        np.asarray(st_c["point_counter"]), atol=1e-6)

    # gradients agree too (the compaction path is differentiable)
    def loss(net):
        def f(p):
            out, _ = net.forward(p, statics, state, b, 100.0,
                                 training=True, perturb=0.0)
            return jnp.mean(out["rgb"]) + jnp.mean(out["comp_loss"])
        return f

    g_f = jax.grad(loss(net_full))(params)
    g_c = jax.grad(loss(net_cmp))(params)
    for a, bb in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_c)):
        # assert_allclose treats NaN == NaN as equal — require finiteness
        # so the comparison can't be vacuously true
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4)


def test_zero_point_dist_keeps_gradients_finite(setup):
    """Regression: a point_dist element at exactly 0 makes the
    self-neighbour direction the zero vector; jnp.linalg.norm would
    back-propagate NaN there (torch returns subgradient 0 — the
    reference trains through this point).  Caught by a 2000-iter soak
    run that NaN'd at ~iter 750."""
    net, params, state, statics, batch = setup
    params = jax.tree.map(lambda x: x, params)
    pd = np.asarray(params["point_dist"]).copy()
    pd[:8] = 0.0                               # exact zeros
    params["point_dist"] = jnp.asarray(pd)

    def loss(p):
        out, _ = net.forward(p, statics, state, batch, 100.0,
                             training=True, perturb=0.0)
        return jnp.mean(out["rgb"]) + jnp.mean(out["comp_loss"])

    val, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_inert_non_rigid_fast_path_exact(setup):
    """When the non-rigid MLP cannot kick in before maxiter, its offset
    is a per-frame constant — the broadcast fast path must match the full
    per-sample evaluation exactly (values and gradients)."""
    import dataclasses

    _, params, state, _, batch = setup

    def build(maxiter):
        net = _mini_network()
        net.cfg = dataclasses.replace(net.cfg, nr_kick_in_iter=1000,
                                      train_maxiter=maxiter)
        return net

    net_fast = build(100)          # 1000 >= 100: inert -> fast path
    net_full = build(10 ** 9)      # full per-sample evaluation
    assert net_fast.cfg.non_rigid_inert_in_train
    assert not net_full.cfg.non_rigid_inert_in_train
    from occnerf_tpu.smpl import synthetic_smpl_model
    from occnerf_tpu.smpl.model import SMPL, save_model
    import tempfile, os
    model = synthetic_smpl_model(n_verts=128, seed=2)
    d = tempfile.mkdtemp()
    save_model(model, os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))
    statics = net_fast.generate_neural_points(verts, joints, smpl.faces)
    net_full.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_fast.init(jax.random.PRNGKey(0), statics)

    def run(net, p):
        out, _ = net.forward(p, statics, state, batch, 50.0,
                             training=True, perturb=0.0)
        return out

    out_a, out_b = run(net_fast, params), run(net_full, params)
    np.testing.assert_allclose(np.asarray(out_a["rgb"]),
                               np.asarray(out_b["rgb"]), atol=1e-6)

    def loss(net):
        return lambda p: jnp.mean(run(net, p)["rgb"])

    g_a = jax.grad(loss(net_fast))(params)
    g_b = jax.grad(loss(net_full))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_bf16_rank_and_eval_dtypes_close(setup, rng):
    """cfg.tpu.rank_compute_dtype / eval_compute_dtype = bfloat16 narrow
    only the no-grad Pallas matmuls (the compaction ranking pass in
    two-pass training; the whole motion+encode path at eval) — outputs
    stay within bf16 rounding of the exact f32 network and training
    gradients remain finite.  On CPU the motion kernel takes the XLA
    path (dtype ignored), so this asserts the *plumbing*; the kernel
    rounding itself is covered in test_pallas_ops."""
    _, _, state, _, batch = setup
    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(synthetic_smpl_model(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    def make(rank_dt, eval_dt):
        cfg = NetworkConfig(
            n_samples=64, chunk=32, knn_backend="exact",
            sample_compaction=0.5,
            rank_compute_dtype=rank_dt, eval_compute_dtype=eval_dt,
            cnl_mlp_depth=2, cnl_mlp_width=32,
            cnl_num_levels=4, cnl_log2_hashmap_size=10,
            cnl_base_resolution=4,
            mweight_embedding_size=32, mweight_volume_size=8,
            nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
            nr_kick_in_iter=10, nr_full_band_iter=100,
            pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
        return Network(cfg)

    net_f32 = make("float32", "float32")
    net_bf16 = make("bfloat16", "bfloat16")
    statics = net_f32.generate_neural_points(verts, joints, smpl.faces)
    net_bf16.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_f32.init(jax.random.PRNGKey(0), statics)

    out_f, _ = net_f32.forward(params, statics, state, batch, 1e7,
                               training=False)
    out_b, _ = net_bf16.forward(params, statics, state, batch, 1e7,
                                training=False)
    np.testing.assert_allclose(np.asarray(out_f["rgb"]),
                               np.asarray(out_b["rgb"]), atol=3e-2)

    def loss(net):
        def f(p):
            out, _ = net.forward(p, statics, state, batch, 100.0,
                                 training=True, perturb=0.0)
            return jnp.mean(out["rgb"]) + jnp.mean(out["comp_loss"])
        return f

    g_b = jax.grad(loss(net_bf16))(params)
    for leaf in jax.tree.leaves(g_b):
        assert np.isfinite(np.asarray(leaf)).all()


def test_motion_rank_proxy_exact(setup):
    """Proxy-ranked compaction (tpu.motion_rank_proxy: rank by the
    pooled half-res upper bound, exact full-res motion only on kept
    rows) reproduces the full forward exactly whenever K covers every
    proxy-positive sample — outputs, comp_loss, counter AND gradients."""
    _, _, state0, _, batch = setup
    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model as _ssm
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(_ssm(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    def make(frac, proxy):
        cfg = NetworkConfig(
            n_samples=64, chunk=32, knn_backend="exact",
            sample_compaction=frac, motion_rank_proxy=proxy,
            cnl_mlp_depth=2, cnl_mlp_width=32,
            cnl_num_levels=4, cnl_log2_hashmap_size=10,
            cnl_base_resolution=4,
            mweight_embedding_size=32, mweight_volume_size=8,
            nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
            nr_kick_in_iter=10, nr_full_band_iter=100,
            pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
        return Network(cfg)

    net_full, net_prx = make(1.0, False), make(0.5, True)
    statics = net_full.generate_neural_points(verts, joints, smpl.faces)
    net_prx.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_full.init(jax.random.PRNGKey(0), statics)

    # push rays so over half the samples fall outside the volume (the
    # proxy keeps MORE candidates than exact ranking, so the K-covers-
    # positives condition needs even more empty space)
    b = dict(batch)
    b["far"] = jnp.full_like(batch["far"], 10.0)

    out_f, st_f = net_full.forward(params, statics, state, b, 100.0,
                                   training=True, perturb=0.0)
    out_p, st_p = net_prx.forward(params, statics, state, b, 100.0,
                                  training=True, perturb=0.0)
    np.testing.assert_allclose(np.asarray(out_f["rgb"]),
                               np.asarray(out_p["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["depth"]),
                               np.asarray(out_p["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["alpha"]),
                               np.asarray(out_p["alpha"]), atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(out_f["comp_loss"])),
        float(jnp.sum(out_p["comp_loss"])), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(st_f["point_counter"]),
                               np.asarray(st_p["point_counter"]),
                               atol=1e-6)

    # eval path (single proxy pass + exact kept pass, no grads)
    ev_f, _ = net_full.forward(params, statics, state, b, 1e7,
                               training=False)
    ev_p, _ = net_prx.forward(params, statics, state, b, 1e7,
                              training=False)
    np.testing.assert_allclose(np.asarray(ev_f["rgb"]),
                               np.asarray(ev_p["rgb"]), atol=1e-5)

    def loss(net):
        def f(p):
            out, _ = net.forward(p, statics, state, b, 100.0,
                                 training=True, perturb=0.0)
            return jnp.mean(out["rgb"]) + jnp.mean(out["comp_loss"])
        return f

    g_f = jax.grad(loss(net_full))(params)
    g_p = jax.grad(loss(net_prx))(params)
    for a, bb in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4)


def test_obs_rank_proxy_eval_exact(setup):
    """Baked observation-space ranking (tpu.obs_rank_proxy: one volume
    lookup per sample instead of B bone lookups, eval only) reproduces
    the per-bone proxy eval forward exactly in the K-covers-positives
    regime, and leaves the training path untouched (flag has no effect
    when training=True)."""
    _, _, state0, _, batch = setup
    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model as _ssm
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(_ssm(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    def make(obs):
        cfg = NetworkConfig(
            n_samples=64, chunk=32, knn_backend="exact",
            sample_compaction=0.5, motion_rank_proxy=True,
            obs_rank_proxy=obs,
            cnl_mlp_depth=2, cnl_mlp_width=32,
            cnl_num_levels=4, cnl_log2_hashmap_size=10,
            cnl_base_resolution=4,
            mweight_embedding_size=32, mweight_volume_size=8,
            nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
            nr_kick_in_iter=10, nr_full_band_iter=100,
            pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
        return Network(cfg)

    net_prx, net_obs = make(False), make(True)
    statics = net_prx.generate_neural_points(verts, joints, smpl.faces)
    net_obs.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_prx.init(jax.random.PRNGKey(0), statics)

    # sparse scene (far = 10: most samples far outside the body) so K
    # covers every OBS-positive sample — the baked bound is looser than
    # the per-bone bound (it dominates it, see
    # test_obs_proxy_bounds_grid_interp), so its positive set is larger
    # and needs even more empty space for the covering condition
    b = dict(batch)
    b["far"] = jnp.full_like(batch["far"], 10.0)
    ev_p, _ = net_prx.forward(params, statics, state, b, 1e7,
                              training=False)
    ev_o, _ = net_obs.forward(params, statics, state, b, 1e7,
                              training=False)
    np.testing.assert_allclose(np.asarray(ev_p["rgb"]),
                               np.asarray(ev_o["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev_p["depth"]),
                               np.asarray(ev_o["depth"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev_p["alpha"]),
                               np.asarray(ev_o["alpha"]), atol=1e-5)

    # the flag must be inert in training: identical outputs AND counter
    tr_p, st_p = net_prx.forward(params, statics, state, b, 100.0,
                                 training=True, perturb=0.0)
    tr_o, st_o = net_obs.forward(params, statics, state, b, 100.0,
                                 training=True, perturb=0.0)
    np.testing.assert_array_equal(np.asarray(tr_p["rgb"]),
                                  np.asarray(tr_o["rgb"]))
    np.testing.assert_array_equal(np.asarray(st_p["point_counter"]),
                                  np.asarray(st_o["point_counter"]))


def test_proxy_eval_padded_rays_composite_to_bg(setup):
    """Eval-bucket padding (ray_valid = 0, near = far = 0) under
    proxy-ranked compaction: padded rays composite to exactly bgcolor
    and never crowd real samples out of the kept set (valid-ray outputs
    match the unpadded forward)."""
    _, _, state, _, batch = setup
    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model as _ssm
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(_ssm(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    cfg = NetworkConfig(
        n_samples=64, chunk=64, knn_backend="exact",
        sample_compaction=0.5, motion_rank_proxy=True,
        cnl_mlp_depth=2, cnl_mlp_width=32,
        cnl_num_levels=4, cnl_log2_hashmap_size=10,
        cnl_base_resolution=4,
        mweight_embedding_size=32, mweight_volume_size=8,
        nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
        nr_kick_in_iter=10, nr_full_band_iter=100,
        pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
    net = Network(cfg)
    statics = net.generate_neural_points(verts, joints, smpl.faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    # sparse scene (most samples out of volume) so K covers every
    # proxy-positive sample at BOTH ray counts: padding changes ns_all
    # and hence K, so equality of the valid rays only holds in the
    # exact-compaction regime
    batch = dict(batch)
    batch["far"] = jnp.full_like(batch["far"], 10.0)
    n = batch["rays"].shape[1]
    padded = dict(batch)
    padded["rays"] = jnp.concatenate(
        [batch["rays"], jnp.zeros_like(batch["rays"])], axis=1)
    padded["near"] = jnp.concatenate(
        [batch["near"], jnp.zeros_like(batch["near"])], axis=0)
    padded["far"] = jnp.concatenate(
        [batch["far"], jnp.zeros_like(batch["far"])], axis=0)
    padded["ray_valid"] = jnp.concatenate(
        [jnp.ones((n,), jnp.float32), jnp.zeros((n,), jnp.float32)])

    out_p, _ = net.forward(params, statics, state, padded, 1e7,
                           training=False)
    out_u, _ = net.forward(params, statics, state, batch, 1e7,
                           training=False)
    # padded rays -> exactly bgcolor/255, zero alpha
    np.testing.assert_allclose(
        np.asarray(out_p["rgb"][n:]),
        np.tile(np.asarray(batch["bgcolor"]) / 255.0, (n, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_p["alpha"][n:]), 0.0,
                               atol=1e-6)
    # valid rays unaffected by the padding
    np.testing.assert_allclose(np.asarray(out_p["rgb"][:n]),
                               np.asarray(out_u["rgb"]), atol=1e-5)


def test_eval_sample_compaction_knob(setup):
    """tpu.eval_sample_compaction decouples the no-grad render fraction
    from the training fraction: eval at 1.0 reproduces the uncompacted
    eval forward even when training compaction is on; a fractional eval
    value whose K covers every positive sample matches the full forward
    (the same exactness condition as training compaction); and the
    training pass ignores the eval knob entirely."""
    _, params0, state, statics0, batch = setup

    def make(frac, eval_frac):
        cfg = NetworkConfig(
            n_samples=64, chunk=32, knn_backend="exact",
            sample_compaction=frac, eval_sample_compaction=eval_frac,
            cnl_mlp_depth=2, cnl_mlp_width=32,
            cnl_num_levels=4, cnl_log2_hashmap_size=10,
            cnl_base_resolution=4,
            mweight_embedding_size=32, mweight_volume_size=8,
            nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
            nr_kick_in_iter=10, nr_full_band_iter=100,
            pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
        return Network(cfg)

    from occnerf_tpu.smpl.model import SMPL, save_model, \
        synthetic_smpl_model as _ssm
    import tempfile, os
    d = tempfile.mkdtemp()
    save_model(_ssm(n_verts=128, seed=2), os.path.join(
        d, "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl"))
    smpl = SMPL(model_dir=d)
    verts, joints = smpl(np.zeros(72), np.zeros(10))

    net_full = make(1.0, -1.0)            # no compaction anywhere
    net_e10 = make(0.5, 1.0)              # train compacted, eval exact-off
    net_e05 = make(1.0, 0.5)              # train off, eval compacted
    statics = net_full.generate_neural_points(verts, joints, smpl.faces)
    for net in (net_e10, net_e05):
        net.generate_neural_points(verts, joints, smpl.faces)
    params, state = net_full.init(jax.random.PRNGKey(0), statics)

    # push rays so over half the samples fall outside the volume (the
    # K-covers-positives exactness condition for the fractional arm)
    b = dict(batch)
    b["far"] = jnp.full_like(batch["far"], 10.0)

    out_f, _ = net_full.forward(params, statics, state, b, 1e7,
                                training=False)
    # eval override 1.0: compaction statically off at eval
    out_10, _ = net_e10.forward(params, statics, state, b, 1e7,
                                training=False)
    np.testing.assert_allclose(np.asarray(out_f["rgb"]),
                               np.asarray(out_10["rgb"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f["alpha"]),
                               np.asarray(out_10["alpha"]), atol=1e-6)
    # eval override 0.5 with K covering all positives: exact
    out_05, _ = net_e05.forward(params, statics, state, b, 1e7,
                                training=False)
    np.testing.assert_allclose(np.asarray(out_f["rgb"]),
                               np.asarray(out_05["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f["depth"]),
                               np.asarray(out_05["depth"]), atol=1e-5)

    # the training pass ignores the eval knob: net_e05 trains exactly
    # like net_full (both sample_compaction = 1.0)
    tr_f, _ = net_full.forward(params, statics, state, b, 100.0,
                               training=True, perturb=0.0)
    tr_05, _ = net_e05.forward(params, statics, state, b, 100.0,
                               training=True, perturb=0.0)
    np.testing.assert_allclose(np.asarray(tr_f["rgb"]),
                               np.asarray(tr_05["rgb"]), atol=1e-6)
    np.testing.assert_allclose(
        float(jnp.sum(tr_f["comp_loss"])),
        float(jnp.sum(tr_05["comp_loss"])), rtol=1e-5)
