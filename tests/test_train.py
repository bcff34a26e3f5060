"""Training-stack tests: optimizer groups, LR schedule, checkpoints,
one full train step (vanilla + occnerf MLP), resume round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occnerf_tpu.config import cfg, get_default_cfg, set_cfg
from occnerf_tpu.data.synthetic import make_synthetic_subject


@pytest.fixture(scope="module")
def subject_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("subject")
    return make_synthetic_subject(str(path), n_frames=3, img_size=64,
                                  n_verts=128, seed=0)


def _tiny_cfg(subject_dir, tmp_path, occnerf_mlp=False):
    c = get_default_cfg()
    c.synthetic_dataset_path = subject_dir
    c.patch.N_patches = 2
    c.patch.size = 16
    c.N_samples = 8
    c.mweight_volume.module = \
        "core.nets.occnerf.mweight_vol_decoders.self_vol_decoder"
    c.mweight_volume.volume_size = 8
    c.canonical_mlp.mlp_depth = 2
    c.canonical_mlp.mlp_width = 32
    if occnerf_mlp:
        c.canonical_mlp.module = \
            "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    c.train.maxiter = 2
    c.train.log_interval = 1
    c.train.save_checkpt_interval = 2
    c.progress.dump_interval = 10 ** 9
    c.logdir = str(tmp_path / "logs")
    set_cfg(c)
    return c


def _build(subject_dir):
    import dataclasses

    from occnerf_tpu.app import load_smpl
    from occnerf_tpu.data.subject import SubjectData
    from occnerf_tpu.models.network import Network, NetworkConfig

    subject = SubjectData(subject_dir)
    smpl = load_smpl(subject_dir)
    verts, joints = smpl(np.zeros(smpl.n_joints * 3), subject.avg_betas)
    nc = dataclasses.replace(NetworkConfig.from_cfg(), cnl_num_levels=4,
                             cnl_log2_hashmap_size=10)
    network = Network(nc)
    statics = network.generate_neural_points(verts, joints, smpl.faces)
    params, state = network.init(jax.random.PRNGKey(0), statics)
    return network, statics, params, state


# ---------------------------------------------------------------------------
def test_lr_schedule_matches_reference_formula():
    from occnerf_tpu.train.lr import exp_decay_schedule
    sched = exp_decay_schedule(5e-4, lrate_decay=500)
    # lr = base * 0.1^(iter/(500*1000))  (exp_decay.py:7-19)
    assert np.isclose(float(sched(0)), 5e-4)
    assert np.isclose(float(sched(500_000)), 5e-5, rtol=1e-5)
    flat = exp_decay_schedule(5e-4, decay=False)
    assert np.isclose(float(flat(500_000)), 5e-4)


def test_optimizer_group_labels():
    from occnerf_tpu.train.optimizer import param_labels
    params = {
        "mweight_vol_decoder": {"w": np.zeros(3)},
        "pose_decoder": {"w": np.zeros(3)},
        "non_rigid_mlp": {"w": np.zeros(3)},
        "cnl_mlp": {"w": np.zeros(3)},
        "point_dist": np.zeros(3),
    }
    labels = param_labels(params)
    assert labels["mweight_vol_decoder"]["w"] == "mweight_vol_decoder"
    assert labels["pose_decoder"]["w"] == "pose_decoder"
    assert labels["non_rigid_mlp"]["w"] == "non_rigid_mlp"
    assert labels["cnl_mlp"]["w"] == "__base__"
    assert labels["point_dist"] == "point_dist"


def test_optimizer_applies_group_lrs():
    from occnerf_tpu.train.optimizer import get_optimizer
    params = {"cnl_mlp": jnp.zeros(4), "pose_decoder": jnp.zeros(4)}
    tx, opt_state = get_optimizer(params)
    grads = {"cnl_mlp": jnp.ones(4), "pose_decoder": jnp.ones(4)}
    updates, _ = tx.update(grads, opt_state, params)
    # first Adam step ~= -lr * sign(grad)
    assert np.isclose(float(updates["cnl_mlp"][0]), -cfg.train.lr,
                      rtol=1e-3)
    assert np.isclose(float(updates["pose_decoder"][0]),
                      -cfg.train.lr_pose_decoder, rtol=1e-3)


def test_grad_clipping_in_chain():
    from occnerf_tpu.train.optimizer import get_optimizer
    params = {"cnl_mlp": jnp.zeros(4)}
    tx, opt_state = get_optimizer(params)
    big = {"cnl_mlp": jnp.full(4, 1e6)}
    small = {"cnl_mlp": jnp.full(4, 1e-8)}
    u_big, _ = tx.update(big, opt_state, params)
    # clip(1.0) then adam: big grads normalized; update magnitude ~= lr
    assert np.all(np.abs(np.asarray(u_big["cnl_mlp"])) < 2 * cfg.train.lr)
    u_small, _ = tx.update(small, opt_state, params)
    assert np.all(np.isfinite(np.asarray(u_small["cnl_mlp"])))


# ---------------------------------------------------------------------------
def test_checkpoint_roundtrip(tmp_path):
    from occnerf_tpu.train import checkpoint as ck
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": [jnp.zeros(2), jnp.ones(3)]}
    state = {"counter": jnp.full((5,), 7.0)}
    opt = {"mu": {"a": jnp.ones((2, 3))}}
    ck.save_ckpt(str(tmp_path), "latest", iter_val=123, params=params,
                 state=state, opt_state=opt)
    assert ck.ckpt_exists(str(tmp_path), "latest")

    r = ck.load_ckpt(str(tmp_path), "latest", params_template=params,
                     state_template=state, opt_state_template=opt)
    assert r["iter"] == 123
    np.testing.assert_array_equal(np.asarray(r["params"]["a"]),
                                  np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(r["state"]["counter"]),
                                  np.asarray(state["counter"]))
    # skipping the optimizer section (renderer path)
    r2 = ck.load_ckpt(str(tmp_path), "latest", params_template=params,
                      state_template=state, opt_state_template=None)
    assert r2["opt_state"] is None

    # shape mismatch -> error (strict restore)
    bad = {"a": jnp.zeros((3, 3)), "b": params["b"]}
    with pytest.raises(ValueError):
        ck.load_ckpt(str(tmp_path), "latest", params_template=bad,
                     state_template=state, opt_state_template=None)


def test_async_checkpoint_matches_sync_and_survives_mutation(tmp_path):
    """AsyncCheckpointer writes the enqueued pytree values and is immune
    to the caller mutating (donating) its buffers after enqueue."""
    from occnerf_tpu.train import checkpoint as ck
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": [jnp.zeros(2), jnp.ones(3)]}
    state = {"counter": jnp.full((5,), 7.0)}
    opt = {"mu": {"a": jnp.ones((2, 3))}}

    saver = ck.AsyncCheckpointer()
    try:
        saver.save(str(tmp_path), "first", iter_val=9, params=params,
                   state=state, opt_state=opt)
        first_a = np.asarray(params["a"])
        # emulate buffer donation: the caller's arrays move on while the
        # writer is (possibly) still flushing
        params["a"] = params["a"] * 0.0 - 5.0
        state["counter"] = state["counter"] + 100.0
        saver.save(str(tmp_path), "latest", iter_val=10, params=params,
                   state=state, opt_state=opt)
        saver.wait()
    finally:
        saver.close()

    tmpl = {"a": jnp.zeros((2, 3)), "b": [jnp.zeros(2), jnp.zeros(3)]}
    st_t = {"counter": jnp.zeros(5)}
    op_t = {"mu": {"a": jnp.zeros((2, 3))}}
    r1 = ck.load_ckpt(str(tmp_path), "first", params_template=tmpl,
                      state_template=st_t, opt_state_template=op_t)
    # pre-mutation values survived in the first save
    assert r1["iter"] == 9
    np.testing.assert_array_equal(np.asarray(r1["params"]["a"]), first_a)
    np.testing.assert_array_equal(np.asarray(r1["state"]["counter"]),
                                  np.full((5,), 7.0))
    r2 = ck.load_ckpt(str(tmp_path), "latest", params_template=tmpl,
                      state_template=st_t, opt_state_template=op_t)
    assert r2["iter"] == 10
    np.testing.assert_array_equal(np.asarray(r2["params"]["a"]),
                                  np.full((2, 3), -5.0))
    np.testing.assert_array_equal(np.asarray(r2["state"]["counter"]),
                                  np.full((5,), 107.0))


def test_async_checkpoint_error_surfaces(tmp_path):
    from occnerf_tpu.train import checkpoint as ck
    saver = ck.AsyncCheckpointer()
    # unwritable logdir: a FILE occupies the path
    blocked = tmp_path / "logs"
    blocked.write_text("not a directory")
    saver.save(str(blocked), "latest", iter_val=1,
               params={"a": jnp.zeros(2)}, state={}, opt_state=None)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        saver.wait()


def test_trainer_async_checkpoint_end_to_end(subject_dir, tmp_path):
    """Trainer with tpu.async_checkpoint writes a resumable 'latest'
    the sync path restores identically."""
    _tiny_cfg(subject_dir, tmp_path)
    cfg.tpu.async_checkpoint = True
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    network, statics, params, state = _build(subject_dir)
    trainer = create_trainer(network, statics, params, state)
    loader = create_dataloader("train")
    trainer.train(epoch=1, dataloader=loader)
    trainer.save_ckpt("latest")
    trainer.wait_ckpt()
    saved_iter = trainer.iter

    cfg.resume = True
    cfg.tpu.async_checkpoint = False
    network2, statics2, params2, state2 = _build(subject_dir)
    trainer2 = create_trainer(network2, statics2, params2, state2)
    assert trainer2.iter == saved_iter + 1
    for x, y in zip(jax.tree_util.tree_leaves(trainer.params),
                    jax.tree_util.tree_leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
@pytest.mark.parametrize("occnerf_mlp", [False, True])
def test_train_step_decreases_nothing_blows_up(subject_dir, tmp_path,
                                               occnerf_mlp):
    _tiny_cfg(subject_dir, tmp_path, occnerf_mlp=occnerf_mlp)
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    network, statics, params, state = _build(subject_dir)
    trainer = create_trainer(network, statics, params, state)
    loader = create_dataloader("train")
    batch = next(iter(loader))

    loss1, losses = trainer.train_step(batch)
    assert np.isfinite(float(loss1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    if occnerf_mlp:
        assert "comp_loss" in losses
        # the visibility counter is carried state and must have moved or
        # stayed finite
        assert np.all(np.isfinite(np.asarray(
            trainer.state["point_counter"])))
    loss2, _ = trainer.train_step(batch)
    assert np.isfinite(float(loss2))


def test_trainer_resume_roundtrip(subject_dir, tmp_path):
    _tiny_cfg(subject_dir, tmp_path)
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    network, statics, params, state = _build(subject_dir)
    trainer = create_trainer(network, statics, params, state)
    loader = create_dataloader("train")
    trainer.train(epoch=1, dataloader=loader)
    assert trainer.iter >= 2
    trainer.save_ckpt("latest")
    saved_iter = trainer.iter

    cfg.resume = True
    network2, statics2, params2, state2 = _build(subject_dir)
    trainer2 = create_trainer(network2, statics2, params2, state2)
    assert trainer2.iter == saved_iter + 1
    a = jax.tree_util.tree_leaves(trainer.params)
    b = jax.tree_util.tree_leaves(trainer2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_trainer_aborts_on_nonfinite_loss(subject_dir, tmp_path):
    """The non-finite-loss guard stops training before a NaN state is
    checkpointed over the last finite one."""
    _tiny_cfg(subject_dir, tmp_path)
    from occnerf_tpu.data import create_dataloader
    from occnerf_tpu.train import create_trainer

    network, statics, params, state = _build(subject_dir)
    trainer = create_trainer(network, statics, params, state)
    loader = create_dataloader("train")

    def nan_step(p, s, o, st, lp, b, it, key):
        return p, s, o, jnp.float32(np.nan), {"mse": jnp.float32(np.nan)}

    trainer._train_step = nan_step
    with pytest.raises(FloatingPointError):
        trainer.train(0, loader)
