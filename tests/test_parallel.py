"""Mesh/sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4(d): the sharded ray axis must produce the same numbers as the
single-device run — XLA makes this testable without real chips.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occnerf_tpu.config import get_default_cfg, set_cfg


@pytest.fixture(autouse=True)
def _cfg():
    set_cfg(get_default_cfg())


def test_make_mesh_all_devices():
    from occnerf_tpu.parallel import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_batch_shardings_layout():
    from occnerf_tpu.parallel import batch_shardings, make_mesh
    mesh = make_mesh()
    batch = {
        "rays": np.zeros((2, 64, 3), np.float32),
        "near": np.zeros((64, 1), np.float32),
        "ray_valid": np.zeros((64,), np.float32),
        "dst_Rs": np.zeros((24, 3, 3), np.float32),
        "bgcolor": np.zeros((3,), np.float32),
    }
    sh = batch_shardings(mesh, batch)
    assert sh["rays"].spec == jax.sharding.PartitionSpec(None, "data", None)
    assert sh["near"].spec == jax.sharding.PartitionSpec("data", None)
    assert sh["ray_valid"].spec == jax.sharding.PartitionSpec("data")
    assert sh["dst_Rs"].spec == jax.sharding.PartitionSpec()


def test_sharded_forward_matches_single_device():
    """A per-ray computation with a counter scatter (the network's
    communication pattern) gives identical results sharded vs not."""
    from occnerf_tpu.parallel import make_mesh, replicated, shard_batch
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs the virtual multi-device mesh")

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    N, V = 128, 40
    batch = {
        "rays": rng.normal(size=(2, N, 3)).astype(np.float32),
        "near": rng.uniform(0.1, 0.5, (N, 1)).astype(np.float32),
        "ray_valid": (rng.random(N) > 0.3).astype(np.float32),
        "bgcolor": np.array([10.0, 20.0, 30.0], np.float32),
    }
    w = rng.normal(size=(3, V)).astype(np.float32)

    def fwd(w, batch):
        o, d = batch["rays"][0], batch["rays"][1]
        feat = (o + d * batch["near"]) @ w            # (N, V)
        idx = jnp.argmax(feat, axis=1)                # per-ray vertex pick
        counter = jnp.zeros((V,), jnp.float32).at[idx].add(
            batch["ray_valid"])
        return feat * batch["ray_valid"][:, None], counter

    ref_feat, ref_counter = jax.jit(fwd)(w, jax.tree.map(jnp.asarray,
                                                         batch))

    with mesh:
        sbatch = shard_batch(mesh, batch)
        sw = replicated(mesh, jnp.asarray(w))
        sh_feat, sh_counter = jax.jit(fwd)(sw, sbatch)

    np.testing.assert_allclose(np.asarray(sh_feat), np.asarray(ref_feat),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_counter),
                               np.asarray(ref_counter), atol=1e-6)


def test_network_forward_sharded_equals_single():
    """The real network forward on an 8-way sharded ray axis matches the
    unsharded result."""
    import dataclasses

    from occnerf_tpu.models.network import Network, NetworkConfig
    from occnerf_tpu.parallel import make_mesh, replicated, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(0)
    nc = dataclasses.replace(
        NetworkConfig.from_cfg(),
        canonical_module="core.nets.occnerf.canonical_mlps.mlp_rgb_sigma",
        cnl_mlp_depth=2, cnl_mlp_width=32, n_samples=4,
        mweight_module="self_vol", mweight_volume_size=8)
    net = Network(nc)
    verts = rng.normal(0, 0.2, (64, 3)).astype(np.float32)
    joints = rng.normal(0, 0.3, (24, 3)).astype(np.float32)
    faces = rng.integers(0, 64, (100, 3)).astype(np.int32)
    statics = net.generate_neural_points(verts, joints, faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    N = 64
    batch = {
        "rays": rng.normal(size=(2, N, 3)).astype(np.float32),
        "near": np.full((N, 1), 0.1, np.float32),
        "far": np.full((N, 1), 2.0, np.float32),
        "ray_valid": np.ones((N,), np.float32),
        "dst_Rs": np.tile(np.eye(3, dtype=np.float32), (24, 1, 1)),
        "dst_Ts": np.zeros((24, 3), np.float32),
        "cnl_gtfms": np.tile(np.eye(4, dtype=np.float32), (24, 1, 1)),
        "motion_weights_priors":
            rng.uniform(0.01, 1, (25, 8, 8, 8)).astype(np.float32),
        "dst_posevec": np.full((69,), 0.01, np.float32),
        "cnl_bbox_min_xyz": np.array([-1, -1, -1], np.float32),
        "cnl_bbox_scale_xyz": np.array([1, 1, 1], np.float32),
        "bgcolor": np.array([255.0, 255.0, 255.0], np.float32),
    }

    def fwd(params, state, batch):
        out, _ = net.forward(params, statics, state, batch, 1.0,
                             training=False, perturb=0.0)
        return out["rgb"], out["alpha"]

    ref_rgb, ref_alpha = jax.jit(fwd)(
        params, state, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    with mesh:
        sbatch = shard_batch(mesh, batch)
        sparams = replicated(mesh, params)
        sstate = replicated(mesh, state)
        rgb, alpha = jax.jit(fwd)(sparams, sstate, sbatch)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref_alpha),
                               atol=1e-5)


def test_train_loss_and_grads_sharded_equal_single():
    """SURVEY §4(d) strongest form: training loss AND parameter gradients
    on the flagship (occnerf MLP + compaction) path are equal between one
    device and the 8-way sharded ray axis."""
    import dataclasses

    from occnerf_tpu.models.network import Network, NetworkConfig
    from occnerf_tpu.parallel import make_mesh, replicated, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(1)
    nc = NetworkConfig(
        n_samples=16, chunk=64, knn_backend="exact",
        sample_compaction=0.5, train_chunk=32,
        cnl_mlp_depth=2, cnl_mlp_width=32,
        cnl_num_levels=4, cnl_log2_hashmap_size=10, cnl_base_resolution=4,
        mweight_module="self_vol", mweight_embedding_size=32,
        mweight_volume_size=8,
        nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
        nr_kick_in_iter=10, nr_full_band_iter=100,
        pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
    net = Network(nc)
    verts = rng.normal(0, 0.2, (96, 3)).astype(np.float32)
    joints = rng.normal(0, 0.3, (24, 3)).astype(np.float32)
    faces = rng.integers(0, 96, (100, 3)).astype(np.int32)
    statics = net.generate_neural_points(verts, joints, faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    N = 64
    batch = {
        "rays": np.stack([
            rng.normal(0, 0.1, (N, 3)) + [0, 0, -2.0],
            np.tile([0, 0, 1.0], (N, 1))]).astype(np.float32),
        "near": np.full((N, 1), 1.0, np.float32),
        "far": np.full((N, 1), 3.0, np.float32),
        "ray_valid": np.ones((N,), np.float32),
        "dst_Rs": np.tile(np.eye(3, dtype=np.float32), (24, 1, 1)),
        "dst_Ts": np.zeros((24, 3), np.float32),
        "cnl_gtfms": np.tile(np.eye(4, dtype=np.float32), (24, 1, 1)),
        "motion_weights_priors":
            rng.uniform(0.01, 1, (25, 8, 8, 8)).astype(np.float32),
        "dst_posevec": np.full((69,), 0.01, np.float32),
        "cnl_bbox_min_xyz": np.array([-1, -1, -1], np.float32),
        "cnl_bbox_scale_xyz": np.array([1, 1, 1], np.float32),
        "bgcolor": np.array([255.0, 255.0, 255.0], np.float32),
    }

    def loss_fn(params, batch):
        out, new_state = net.forward(params, statics, state, batch, 100.0,
                                     training=True, perturb=0.0)
        return (jnp.mean(out["rgb"]) + jnp.sum(out["comp_loss"]) / 1e3,
                new_state["point_counter"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    (ref_loss, ref_counter), ref_grads = grad_fn(
        params, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    with mesh:
        sbatch = shard_batch(mesh, batch)
        sparams = replicated(mesh, params)
        (sh_loss, sh_counter), sh_grads = grad_fn(sparams, sbatch)

    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_counter),
                               np.asarray(ref_counter), atol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(sh_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_production_trainer_mesh_dp_equals_single_device(tmp_path):
    """The REAL Trainer (train.py path) on the 8-way mesh produces the
    same step losses as single-device (VERDICT round-1 item #2: mesh data
    parallelism wired into the production trainer, not just the dryrun)."""
    import numpy as np

    from occnerf_tpu.config import cfg, get_default_cfg, set_cfg
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.data.synthetic import make_synthetic_subject
    from occnerf_tpu.train import create_trainer

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    subject_dir = make_synthetic_subject(
        str(tmp_path / "subject"), n_frames=2, img_size=64, n_verts=128,
        seed=0)

    def build_cfg(mesh_shape):
        c = get_default_cfg()
        c.synthetic_dataset_path = subject_dir
        c.patch.N_patches = 2
        c.patch.size = 16              # 512 rays, divisible by 8
        c.N_samples = 8
        c.canonical_mlp.module = \
            "core.nets.occnerf.canonical_mlps.occnerf_mlp"
        c.canonical_mlp.mlp_depth = 2
        c.canonical_mlp.mlp_width = 32
        # the production-default deconv decoder, shrunk via the
        # base_channels TPU extension so the 8-way CPU mesh covers the
        # conv-transpose sharding path (VERDICT r2 #6)
        c.mweight_volume.module = \
            "core.nets.occnerf.mweight_vol_decoders.deconv_vol_decoder"
        c.mweight_volume.embedding_size = 32
        c.mweight_volume.volume_size = 8
        c.mweight_volume.base_channels = 64
        c.tpu.sample_compaction = 0.5  # flagship compaction path
        c.train.maxiter = 2
        c.progress.dump_interval = 10 ** 9
        c.logdir = str(tmp_path / f"logs_{mesh_shape[0]}")
        c.tpu.mesh_shape = mesh_shape
        set_cfg(c)
        return c

    # sample the two batches ONCE — the loader's patch sampling and
    # random background consume host RNG, so re-creating it per run
    # would feed the two trainers different data
    build_cfg([1])
    loader = create_dataloader("train")
    it = iter(loader)
    batches = [next(it), next(it)]

    def run(mesh_shape):
        import dataclasses

        from occnerf_tpu.app import load_smpl
        from occnerf_tpu.data.subject import SubjectData
        from occnerf_tpu.models.network import Network, NetworkConfig

        build_cfg(mesh_shape)
        subject = SubjectData(subject_dir)
        smpl = load_smpl(subject_dir)
        verts, joints = smpl(np.zeros(smpl.n_joints * 3),
                             subject.avg_betas)
        nc = dataclasses.replace(NetworkConfig.from_cfg(),
                                 cnl_num_levels=4,
                                 cnl_log2_hashmap_size=10)
        network = Network(nc)
        statics = network.generate_neural_points(verts, joints,
                                                 smpl.faces)
        params, state = network.init(jax.random.PRNGKey(0), statics)
        trainer = create_trainer(network, statics, params, state)
        losses = [float(trainer.train_step(b)[0]) for b in batches]
        return trainer, losses

    t1, losses1 = run([1])
    assert t1.mesh is None
    t8, losses8 = run([-1])
    assert t8.mesh is not None and t8.mesh.devices.size == len(
        jax.devices())
    np.testing.assert_allclose(losses8, losses1, rtol=2e-4)
    # the carried visibility counter must agree too (psum'd scatter)
    np.testing.assert_allclose(
        np.asarray(t8.state["point_counter"]),
        np.asarray(t1.state["point_counter"]), atol=1e-5)

    # the perceptual loss must be patch-SHARDED, not replicated: in the
    # per-device SPMD program every 2-D VGG convolution carries at most
    # ceil(P/n) patches (VERDICT r2 #5; the reference data-parallelizes
    # LPIPS, trainer.py:70).  P=2 patches over 8 devices -> batch 1.
    import re
    dbatch = t8._shard_or_put(batches[0])
    lowered = t8._train_step.lower(
        t8.params, t8.state, t8.opt_state, t8.statics, t8.lpips_params,
        dbatch, jnp.float32(1.0), jax.random.PRNGKey(0))
    hlo = lowered.compile().as_text()
    # match the conv's OUTPUT shape (after '='): rank-4 = the NHWC VGG
    # convs (the 3-D deconv stack is rank-5 and exempt)
    out_shape = re.compile(r"= f32\[(\d+),\d+,\d+,\d+\]\S* convolution\(")
    vgg_convs = [(ln, out_shape.search(ln)) for ln in hlo.splitlines()
                 if "convolution(" in ln]
    vgg_convs = [(ln, m) for ln, m in vgg_convs if m]
    assert vgg_convs, "no 2-D convolutions found in the train step HLO"
    for ln, m in vgg_convs:
        assert int(m.group(1)) <= 1, \
            f"replicated VGG conv in per-device HLO: {ln.strip()[:120]}"


def test_proxy_compaction_sharded_equals_single():
    """Proxy-ranked compaction (tpu.motion_rank_proxy) on the sharded ray
    axis matches the single-device render — the global ranking sort and
    the kept-row gather/scatter survive SPMD partitioning."""
    from occnerf_tpu.models.network import Network, NetworkConfig
    from occnerf_tpu.parallel import make_mesh, replicated, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(3)
    nc = NetworkConfig(
        n_samples=16, chunk=64, knn_backend="exact",
        sample_compaction=0.5, motion_rank_proxy=True,
        cnl_mlp_depth=2, cnl_mlp_width=32,
        cnl_num_levels=4, cnl_log2_hashmap_size=10, cnl_base_resolution=4,
        mweight_module="self_vol", mweight_embedding_size=32,
        mweight_volume_size=8,
        nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
        nr_kick_in_iter=10, nr_full_band_iter=100,
        pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
    net = Network(nc)
    verts = rng.normal(0, 0.2, (96, 3)).astype(np.float32)
    joints = rng.normal(0, 0.3, (24, 3)).astype(np.float32)
    faces = rng.integers(0, 96, (100, 3)).astype(np.int32)
    statics = net.generate_neural_points(verts, joints, faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    N = 64
    batch = {
        "rays": np.stack([
            rng.normal(0, 0.1, (N, 3)) + [0, 0, -2.0],
            np.tile([0, 0, 1.0], (N, 1))]).astype(np.float32),
        "near": np.full((N, 1), 1.0, np.float32),
        "far": np.full((N, 1), 3.0, np.float32),
        "ray_valid": np.ones((N,), np.float32),
        "dst_Rs": np.tile(np.eye(3, dtype=np.float32), (24, 1, 1)),
        "dst_Ts": np.zeros((24, 3), np.float32),
        "cnl_gtfms": np.tile(np.eye(4, dtype=np.float32), (24, 1, 1)),
        "motion_weights_priors":
            rng.uniform(0.01, 1, (25, 8, 8, 8)).astype(np.float32),
        "dst_posevec": np.full((69,), 0.01, np.float32),
        "cnl_bbox_min_xyz": np.array([-1, -1, -1], np.float32),
        "cnl_bbox_scale_xyz": np.array([1, 1, 1], np.float32),
        "bgcolor": np.array([255.0, 255.0, 255.0], np.float32),
    }

    def fwd(params, state, batch):
        out, _ = net.forward(params, statics, state, batch, 1e7,
                             training=False, perturb=0.0)
        return out["rgb"], out["depth"]

    ref_rgb, ref_depth = jax.jit(fwd)(
        params, state, jax.tree.map(jnp.asarray, batch))

    mesh = make_mesh()
    with mesh:
        sbatch = shard_batch(mesh, batch)
        sparams = replicated(mesh, params)
        sstate = replicated(mesh, state)
        rgb, depth = jax.jit(fwd)(sparams, sstate, sbatch)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref_depth),
                               atol=1e-5)


def test_make_renderer_mesh_divisibility_fallback(capsys):
    """A batch whose ray count does not divide the mesh falls back to
    single-device placement with a one-time warning and still renders
    the same values as a divisible (sharded) batch's common prefix
    (app.py make_renderer fallback — the last untested branch flagged by
    the round-2 advisor)."""
    from occnerf_tpu.app import make_renderer
    from occnerf_tpu.models.network import Network, NetworkConfig

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")

    rng = np.random.default_rng(5)
    nc = NetworkConfig(
        n_samples=8, chunk=64, knn_backend="exact",
        cnl_mlp_depth=2, cnl_mlp_width=32,
        cnl_num_levels=4, cnl_log2_hashmap_size=10, cnl_base_resolution=4,
        mweight_module="self_vol", mweight_embedding_size=32,
        mweight_volume_size=8,
        nr_mlp_width=16, nr_mlp_depth=3, nr_skips=(2,),
        nr_kick_in_iter=10, nr_full_band_iter=100,
        pose_mlp_width=32, pose_mlp_depth=2, pose_kick_in_iter=50)
    net = Network(nc)
    verts = rng.normal(0, 0.2, (96, 3)).astype(np.float32)
    joints = rng.normal(0, 0.3, (24, 3)).astype(np.float32)
    faces = rng.integers(0, 96, (100, 3)).astype(np.int32)
    statics = net.generate_neural_points(verts, joints, faces)
    params, state = net.init(jax.random.PRNGKey(0), statics)

    def make_batch(N):
        return {
            "rays": np.stack([
                rng.normal(0, 0.1, (N, 3)) * 0 + [0, 0, -2.0],
                np.tile([0, 0, 1.0], (N, 1))]).astype(np.float32),
            "near": np.full((N, 1), 1.0, np.float32),
            "far": np.full((N, 1), 3.0, np.float32),
            "ray_valid": np.ones((N,), np.float32),
            "dst_Rs": np.tile(np.eye(3, dtype=np.float32), (24, 1, 1)),
            "dst_Ts": np.zeros((24, 3), np.float32),
            "cnl_gtfms": np.tile(np.eye(4, dtype=np.float32), (24, 1, 1)),
            "motion_weights_priors":
                rng.uniform(0.01, 1, (25, 8, 8, 8)).astype(np.float32),
            "dst_posevec": np.full((69,), 0.01, np.float32),
            "cnl_bbox_min_xyz": np.array([-1, -1, -1], np.float32),
            "cnl_bbox_scale_xyz": np.array([1, 1, 1], np.float32),
            "bgcolor": np.array([255.0, 255.0, 255.0], np.float32),
        }

    render = make_renderer(net, statics, params, state)
    ndev = len(jax.devices())
    div = make_batch(8 * ndev)              # sharded path
    out_div = render(div)
    capsys.readouterr()

    # indivisible ray count: identical ray content on the first rows
    odd_n = 8 * ndev - 3
    odd = {k: (v[:, :odd_n] if k == "rays" else
               v[:odd_n] if v.shape[:1] == (8 * ndev,) else v)
           for k, v in div.items()}
    assert odd["near"].shape[0] == odd_n
    out_odd = render(odd)
    msg = capsys.readouterr().out
    assert "not divisible" in msg
    np.testing.assert_allclose(np.asarray(out_odd["rgb"]),
                               np.asarray(out_div["rgb"])[:odd_n],
                               atol=1e-5)

    # the warning is one-time
    render(odd)
    assert "not divisible" not in capsys.readouterr().out
