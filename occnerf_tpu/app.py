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


def build_model(subject, dataset_path: Optional[str] = None,
                seed: Optional[int] = None
                ) -> Tuple[Any, Dict[str, Any], Dict[str, Any],
                           Dict[str, Any]]:
    """(network, statics, params, state) for a loaded SubjectData."""
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
