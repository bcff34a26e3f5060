"""Application assembly helpers shared by train.py / run.py / eval.py.

Mirrors the wiring the reference does inline in its entry points
(`train.py:16-44`, `run.py:26-37`): build the network, run SMPL at the
subject's average betas in zero pose, generate the neural point cloud, and
init or restore parameters.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

from .config import cfg
from .models import create_network
from .smpl.model import MODEL_FILENAMES, SMPL
from .train import checkpoint as ckpt


def load_smpl(dataset_path: Optional[str] = None) -> SMPL:
    """Locate the SMPL body model: the configured model dir first
    (`cfg.smpl_model_dir`), then a dataset-local ``smpl_model.pkl``
    (written by the synthetic subject generator)."""
    sex = cfg.get("sex", "neutral")
    candidates = []
    model_dir = cfg.get("smpl_model_dir", "third_parties/smpl/models")
    candidates.append(os.path.join(model_dir, MODEL_FILENAMES[sex]))
    if dataset_path:
        candidates.append(os.path.join(dataset_path, "smpl_model.pkl"))
    for path in candidates:
        if os.path.exists(path):
            return SMPL(model_path=path)
    raise FileNotFoundError(
        f"No SMPL model found; looked in {candidates}. Place the neutral "
        "SMPL pkl under cfg.smpl_model_dir or use the synthetic subject.")


def apply_tpu_settings() -> None:
    """Apply cfg.tpu ops knobs (compute dtype, KNN recall, hash-grid
    backend) — must run before the first jit trace of the model."""
    from .ops import (set_compute_dtype, set_hashgrid_backend,
                      set_knn_recall, set_vertagg_backend,
                      set_xla_matmul_precision)
    tpu = cfg.get("tpu", {})
    set_compute_dtype(tpu.get("compute_dtype", "float32"))
    set_xla_matmul_precision(tpu.get("xla_matmul_precision", "default"))
    set_knn_recall(tpu.get("knn_recall", 0.95))
    set_hashgrid_backend(tpu.get("hashgrid_backend", "auto"))
    set_vertagg_backend(tpu.get("vertagg_backend", "auto"))


def build_model(subject, dataset_path: Optional[str] = None,
                seed: Optional[int] = None
                ) -> Tuple[Any, Dict[str, Any], Dict[str, Any],
                           Dict[str, Any]]:
    """(network, statics, params, state) for a loaded SubjectData."""
    apply_tpu_settings()
    smpl = load_smpl(dataset_path or subject.dataset_path)
    verts, joints = smpl(np.zeros(smpl.n_joints * 3), subject.avg_betas)
    network = create_network()
    statics = network.generate_neural_points(verts, joints, smpl.faces)
    key = jax.random.PRNGKey(
        cfg.get("tpu", {}).get("seed", 42) if seed is None else seed)
    params, state = network.init(key, statics)

    # self_vol decoder starts from the Gaussian bone prior: matrix =
    # log(prior) so softmax(matrix) == prior (reference train.py:29-31;
    # run/eval seed the same way before loading a checkpoint)
    if "matrix" in params.get("mweight_vol_decoder", {}):
        import jax.numpy as jnp
        params["mweight_vol_decoder"]["matrix"] = jnp.log(jnp.asarray(
            np.clip(subject.motion_weights_priors, 1e-12, None)))
    return network, statics, params, state


def load_network_for_eval(subject, dataset_path: Optional[str] = None):
    """Build the model and restore ``cfg.load_net`` (reference
    `run.py:26-37`)."""
    network, statics, params, state = build_model(subject, dataset_path)
    name = cfg.load_net
    if ckpt.ckpt_exists(cfg.logdir, name):
        restored = ckpt.load_ckpt(
            cfg.logdir, name, params_template=params,
            state_template=state, opt_state_template=None)
        params, state = restored["params"], restored["state"]
        print(f"loaded checkpoint {name} (iter {restored['iter']})")
    else:
        print(f"[WARN] checkpoint '{name}' not found in {cfg.logdir}; "
              "rendering with fresh init")
    return network, statics, params, state


def make_renderer(network, statics, params, state,
                  iter_val: Optional[float] = None,
                  ignore_non_rigid: Optional[bool] = None):
    """Jitted ``render(batch) -> out`` shared by run.py/eval.py.

    When more than one device is visible, the padded ray buckets are
    sharded over the 1-D data mesh and params/state replicate — the same
    layout the Trainer uses (the reference deploys its MLPs across all
    GPUs for rendering too, `run.py:26-37` deploy_mlps_to_secondary_gpus).
    Eval buckets from the data layer are multiples of
    ``tpu.eval_ray_bucket`` (>= 1024, device counts are powers of two) so
    they shard evenly; a caller-supplied batch with an indivisible ray
    count falls back to single-device placement with a one-time warning.
    """
    from .parallel import make_mesh, replicated, shard_batch
    from .train.trainer import EXCLUDE_KEYS_TO_GPU

    import jax.numpy as jnp

    mesh = make_mesh()
    if mesh.devices.size <= 1:
        mesh = None
    else:
        params = replicated(mesh, params)
        state = replicated(mesh, state)
        statics = replicated(mesh, statics)

    it = float(cfg.eval_iter if iter_val is None else iter_val)
    inr = bool(cfg.ignore_non_rigid_motions
               if ignore_non_rigid is None else ignore_non_rigid)

    @jax.jit
    def _render(params, state, statics, batch):
        out, _ = network.forward(params, statics, state, batch, it,
                                 training=False, perturb=0.0,
                                 ignore_non_rigid=inr)
        return out

    warned_fallback = [False]

    def render(batch):
        host = {k: v for k, v in batch.items()
                if k not in EXCLUDE_KEYS_TO_GPU}
        if mesh is not None:
            n = batch["near"].shape[0]
            if n % mesh.devices.size == 0:
                dbatch = shard_batch(mesh, host)
                return _render(params, state, statics, dbatch)
            if not warned_fallback[0]:
                warned_fallback[0] = True
                print(f"[renderer] WARNING: batch of {n} rays not "
                      f"divisible by the {mesh.devices.size}-device mesh; "
                      "single-device placement for such batches")
        dbatch = {k: jnp.asarray(v) for k, v in host.items()}
        return _render(params, state, statics, dbatch)

    return render
