"""SMPL body model (pure numpy, host-side).

Clean-room implementation of the standard SMPL linear-blend-skinning
forward pass — shape blendshapes, pose blendshapes (207-d flattened
rotation residuals), joint regression, kinematic-chain FK and LBS — with
the same call surface as the reference wrapper
(`third_parties/smpl/smpl_numpy.py:45-102`): ``verts, joints = smpl(pose,
betas, trans=None)``.

The neutral model pickle must be obtained separately (SMPL license); see
``tools/clean_smpl_pkl.py`` for stripping chumpy objects.  For tests and
benchmarking without the licensed asset, :func:`synthetic_smpl_model`
fabricates a small random but anatomically-wired model.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np

from ..utils.body import SMPL_PARENT_ARRAY, rodrigues

MODEL_FILENAMES = {
    "male": "basicmodel_m_lbs_10_207_0_v1.0.0.pkl",
    "female": "basicModel_f_lbs_10_207_0_v1.0.0.pkl",
    "neutral": "basicModel_neutral_lbs_10_207_0_v1.0.0.pkl",
}


def _dense(a):
    """scipy sparse / chumpy / ndarray -> ndarray."""
    if hasattr(a, "todense"):
        a = a.todense()
    return np.asarray(a, dtype=np.float64)


class SMPL:
    """SMPL LBS forward model."""

    def __init__(self, sex: str = "neutral", model_dir: str = "",
                 model_path: Optional[str] = None):
        if model_path is None:
            model_path = os.path.join(model_dir, MODEL_FILENAMES[sex])
        with open(model_path, "rb") as f:
            data = pickle.load(f, encoding="latin1")

        self.J_regressor = _dense(data["J_regressor"])        # (J, V)
        self.weights = _dense(data["weights"])                # (V, J)
        self.posedirs = _dense(data["posedirs"])              # (V, 3, 9(J-1))
        self.v_template = _dense(data["v_template"])          # (V, 3)
        self.shapedirs = _dense(data["shapedirs"])            # (V, 3, 10)
        self.faces = np.asarray(data["f"], dtype=np.int32)    # (F, 3)

        if "kintree_table" in data:
            kt = np.asarray(data["kintree_table"], dtype=np.int64)
            id_to_col = {int(kt[1, i]): i for i in range(kt.shape[1])}
            self.parent = np.array(
                [id_to_col[int(kt[0, i])] for i in range(1, kt.shape[1])],
                dtype=np.int64)
        else:
            self.parent = SMPL_PARENT_ARRAY[1:].copy()

        self.n_verts = self.v_template.shape[0]
        self.n_joints = self.J_regressor.shape[0]

    def __call__(self, pose: np.ndarray, beta: np.ndarray,
                 trans: Optional[np.ndarray] = None
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """pose: (J*3,) axis-angle or (J,3,3) rotations; beta: (10,)."""
        V, J = self.n_verts, self.n_joints

        beta = np.asarray(beta, dtype=np.float64).reshape(-1)
        v_shaped = (self.shapedirs.reshape(V * 3, -1) @ beta
                    ).reshape(V, 3) + self.v_template
        joints_rest = self.J_regressor @ v_shaped                  # (J, 3)

        pose = np.asarray(pose)
        if pose.shape == (J, 3, 3):
            R = pose.astype(np.float64)
        else:
            R = rodrigues(pose.reshape(J, 3)).astype(np.float64)

        # pose blendshapes: flattened (R_j - I) for non-root joints
        lrotmin = (R[1:] - np.eye(3)).reshape(-1)                  # (9(J-1),)
        v_posed = v_shaped + (self.posedirs.reshape(V * 3, -1) @ lrotmin
                              ).reshape(V, 3)

        # FK down the kinematic chain
        rel_joints = joints_rest.copy()
        rel_joints[1:] -= joints_rest[self.parent]
        G_local = np.zeros((J, 4, 4))
        G_local[:, :3, :3] = R
        G_local[:, :3, 3] = rel_joints
        G_local[:, 3, 3] = 1.0

        G = np.empty_like(G_local)
        G[0] = G_local[0]
        for i in range(1, J):
            G[i] = G[self.parent[i - 1]] @ G_local[i]

        joints = G[:, :3, 3].copy()

        # remove the rest-pose joint contribution (inverse bind)
        correction = np.einsum("jab,jb->ja", G[:, :3, :3], joints_rest)
        G_skin = G.copy()
        G_skin[:, :3, 3] -= correction

        T = np.einsum("vj,jab->vab", self.weights, G_skin)         # (V, 4, 4)
        v_h = np.concatenate([v_posed, np.ones((V, 1))], axis=-1)
        verts = np.einsum("vab,vb->va", T, v_h)[:, :3]

        if trans is not None:
            trans = np.asarray(trans, dtype=np.float64).reshape(1, 3)
            verts = verts + trans
            joints = joints + trans

        return verts.astype(np.float32), joints.astype(np.float32)


def synthetic_smpl_model(n_verts: int = 512, n_joints: int = 24,
                         seed: int = 0) -> dict:
    """Fabricate a small random SMPL-format model dict for tests/benchmarks.

    Anatomically wired: vertices cluster around a synthetic skeleton so
    joint regression and skinning weights behave sanely.
    """
    rng = np.random.default_rng(seed)
    parents = SMPL_PARENT_ARRAY[:n_joints]

    # a plausible rest skeleton: random tree offsets, scaled down
    joints = np.zeros((n_joints, 3))
    for i in range(1, n_joints):
        joints[i] = joints[parents[i]] + rng.normal(0, 0.12, 3)

    # vertices near random bones
    owner = rng.integers(0, n_joints, n_verts)
    v_template = joints[owner] + rng.normal(0, 0.05, (n_verts, 3))

    # skinning weights: softmax of negative distance to joints
    d2 = ((v_template[:, None, :] - joints[None, :, :]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.02)
    weights = w / w.sum(-1, keepdims=True)

    # joint regressor: normalized proximity weights
    r = np.exp(-d2.T / 0.005)
    J_regressor = r / np.clip(r.sum(-1, keepdims=True), 1e-12, None)

    shapedirs = rng.normal(0, 0.01, (n_verts, 3, 10))
    posedirs = rng.normal(0, 0.001, (n_verts, 3, 9 * (n_joints - 1)))

    # random triangulation over vertex triples (valid indices only)
    faces = rng.integers(0, n_verts, (2 * n_verts, 3)).astype(np.int32)
    bad = (faces[:, 0] == faces[:, 1]) | (faces[:, 1] == faces[:, 2]) \
        | (faces[:, 0] == faces[:, 2])
    faces = faces[~bad]

    kintree = np.stack([np.concatenate([[2**32 - 1], parents[1:]]),
                        np.arange(n_joints)]).astype(np.int64)

    return {
        "J_regressor": J_regressor,
        "weights": weights,
        "posedirs": posedirs,
        "v_template": v_template,
        "shapedirs": shapedirs,
        "f": faces,
        "kintree_table": kintree,
    }


def save_model(model: dict, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(model, f)
