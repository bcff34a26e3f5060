"""Canonical-space appearance networks.

- VanillaCanonicalMLP: classic NeRF MLP (reference
  `canonical_mlps/mlp_rgb_sigma.py`): positional-embedded input, depth 8 /
  width 256, skip re-concat at the 6th linear, 4 outputs (rgb + sigma).
- OccNeRFCanonicalMLP (reference `canonical_mlps/occnerf_mlp.py`): the
  point-cloud-conditioned network with 4-D hash-grid encodes of
  (surface point, normalized signed distance), visibility-attention
  aggregation over 4x10 multiscale neighbours, a geometry MLP -> (64-d
  feature, sigma) and a color MLP -> rgb; returns 5 channels
  (rgb, sigma, detached signed distance).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

import jax as _jax
from jax import ad_checkpoint as _adc

from ..ops.hashgrid import (HashGridSpec, hash_grid_encode,
                            hash_grid_encode_sorted)
from ..ops import hashgrid_pallas
from .layers import RELU_GAIN, init_linear, linear


def _encode_no_input_grad(x, table, spec, enc_dtype=None):
    """Hash-grid encode for inputs that carry no gradient.

    Backend per ``cfg.tpu.hashgrid_backend`` (ops.set_hashgrid_backend):
    'auto' takes the MXU one-hot Pallas path for kernel-compatible specs
    (tables <= 2^15), the sorted scatter-free backward for bigger tables
    on TPU (the XLA AD scatter lowering costs ~14 s per reference-scale
    step at 2^19), and the plain XLA path off-TPU.

    ``enc_dtype`` overrides the Pallas kernel's matmul input dtype for
    this call (the no-grad eval path passes bfloat16); the sorted/XLA
    backends are exact gathers and ignore it.
    """
    from .. import ops as _ops
    backend = _ops.HASHGRID_BACKEND
    on_tpu = _jax.default_backend() == "tpu"
    if backend == "auto":
        if on_tpu and hashgrid_pallas.supports(spec):
            backend = "pallas"
        elif on_tpu:
            backend = "sorted"
        else:
            backend = "xla"
    if backend == "pallas":
        out = hashgrid_pallas.hash_grid_encode_tpu(x, table, spec,
                                                   compute_dtype=enc_dtype)
    elif backend == "sorted":
        out = hash_grid_encode_sorted(x, table, spec)
    else:
        out = hash_grid_encode(x, table, spec)
    # saved (not recomputed) under the training remat policy
    return _adc.checkpoint_name(out, "hash_enc")


def _safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
               eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm whose gradient at x = 0 is 0 (torch subgradient
    convention).  ``jnp.linalg.norm`` back-propagates x/||x|| = NaN at
    exactly zero — and a later clamp can't repair it (0 * NaN = NaN).
    The learnable per-point offset makes zero vectors reachable: the
    self-neighbour direction IS ``point_dist``, which crossed 0.0 after
    ~750 optimizer steps in the soak run and NaN'd the whole state."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps * eps))


def _cosine_similarity(a: jnp.ndarray, b: jnp.ndarray,
                       eps: float = 1e-8) -> jnp.ndarray:
    num = jnp.sum(a * b, axis=-1)
    den = _safe_norm(a, axis=-1) * _safe_norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


class VanillaCanonicalMLP:
    def __init__(self, input_ch: int = 63, mlp_depth: int = 8,
                 mlp_width: int = 256, skips: Sequence[int] | None = None,
                 **_):
        self.input_ch = input_ch
        self.mlp_depth = mlp_depth
        self.mlp_width = mlp_width
        # reference skips=[4] on the loop index -> re-concat before the
        # (skips[i]+1)-th hidden linear (mlp_rgb_sigma.py:22-29)
        loop_skips = [4] if skips is None else list(skips)
        self.skip_linears = tuple(s + 1 for s in loop_skips)

    def init(self, key: jax.Array):
        keys = jax.random.split(key, self.mlp_depth + 1)
        layers = [init_linear(keys[0], self.input_ch, self.mlp_width,
                              RELU_GAIN)]
        for i in range(1, self.mlp_depth):
            n_in = self.mlp_width + (self.input_ch
                                     if i in self.skip_linears else 0)
            layers.append(init_linear(keys[i], n_in, self.mlp_width,
                                      RELU_GAIN))
        out = init_linear(keys[-1], self.mlp_width, 4, 1.0)
        return {"layers": layers, "output": out}

    def apply(self, params, pos_embed: jnp.ndarray, **_):
        h = pos_embed
        for i, p in enumerate(params["layers"]):
            if i in self.skip_linears:
                h = jnp.concatenate([pos_embed, h], axis=-1)
            h = jax.nn.relu(linear(p, h))
        return linear(params["output"], h)


class OccNeRFCanonicalMLP:
    """Inputs per sample (all shapes flattened over rays*samples = N):
    xyz (N,3) canonical position, knn_points (N,k,3) nearest base verts,
    point_norms (N,k,3) their normals, knn_att (N,4k,1) visibility counts,
    knn_idxs (N,4,k), plus per-*vertex* quantities: surface_points (V,3)
    (the 3-NN normal-weighted surface aggregate the reference calls
    ``point_cloud``), point_sdf (V,1), learnable_points (V,3).
    """

    def __init__(self, mlp_depth: int = 4, mlp_width: int = 256,
                 bound: float = 1.0, num_levels: int = 16, level_dim: int = 2,
                 base_resolution: int = 16, log2_hashmap_size: int = 19,
                 **_):
        self.mlp_depth = mlp_depth
        self.mlp_width = mlp_width
        self.bound = float(bound)
        self.spec = HashGridSpec.create(
            input_dim=4, num_levels=num_levels, level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=2048 * self.bound, gridtype="hash")
        self.enc_dim = self.spec.output_dim        # 32
        self.feat_dim = self.enc_dim + 3           # +learnable point coords
        self.geo_in = self.feat_dim + 1 + self.enc_dim   # agg + var + enc
        self.rgb_in = 64 + self.feat_dim + self.enc_dim

    def init(self, key: jax.Array):
        k_enc, k_geo, k_geo2, k_rgb, k_out = jax.random.split(key, 5)

        def stack(k, first_in):
            ks = jax.random.split(k, self.mlp_depth)
            dims = [first_in] + [self.mlp_width] * self.mlp_depth
            return [init_linear(ks[i], dims[i], dims[i + 1], RELU_GAIN)
                    for i in range(self.mlp_depth)]

        return {
            "encoder": self.spec.init_table(k_enc),
            "pts_linears": stack(k_geo, self.geo_in),
            "geo_linear": init_linear(k_geo2, self.mlp_width, 64 + 1, 1.0),
            "rgb_linears": stack(k_rgb, self.rgb_in),
            "output_linear": init_linear(k_out, self.mlp_width, 3, 1.0),
        }

    # -- pieces -------------------------------------------------------------
    def _att_normalize(self, atts: jnp.ndarray):
        """Attention normalization chain (occnerf_mlp.py:86-120):
        min-shift, max-normalize, variance feature, softmax.  Returns
        (softmax weights (N, K), var (N, 1)); callers must treat the
        weights as detached (the reference stop-gradients the softmax)."""
        atts = atts + 1.0 - jnp.min(atts, axis=1, keepdims=True)
        atts = atts / jnp.max(atts, axis=1, keepdims=True)
        var = jnp.var(atts, axis=1, ddof=1, keepdims=True)       # (N, 1)
        return jax.nn.softmax(atts, axis=1), var

    def simple_agg(self, atts: jnp.ndarray, feats: jnp.ndarray):
        """Visibility-attention aggregation (occnerf_mlp.py:86-126):
        min-shift, max-normalize, variance feature, softmax (detached).

        ``atts`` is 2-D (N, K) — trailing singleton dims force transposed
        TPU layouts (two ~10 ms layout copies per step measured).
        ``feats`` may carry the att lane itself at channel 0 (the fused
        (N, K, 36) gather): the weighted sum runs over ALL channels and
        the caller drops lane 0 after the reduction — slicing (N, K, 35)
        out of the gather beforehand costs a ~24 ms pad in the backward
        (d(gathered) = concat(0, d(feats))) plus layout copies."""
        atts, var = self._att_normalize(atts)
        agg = jnp.einsum("nk,nkc->nc", jax.lax.stop_gradient(atts), feats)
        return agg, var

    def vertex_features(self, params, knn_att_per_vertex: jnp.ndarray,
                        surface_points: jnp.ndarray, point_sdf: jnp.ndarray,
                        learnable_points: jnp.ndarray,
                        concat_map: jnp.ndarray | None = None) -> jnp.ndarray:
        """Per-vertex feature table: visibility counter lane + hash-grid
        encode of (surface aggregate, sdf) + the learnable point coords
        (occnerf_mlp.py:171-178).  Depends only on per-step quantities —
        compute ONCE per forward and share across ray chunks (the encode's
        scatter-add backward costs ~20 ms per call on TPU).  When
        ``concat_map`` is given the table is lifted to the concatenated
        [base; FPS levels] KNN cloud so per-sample gathers need no
        re-indexing."""
        pc_n = (surface_points + self.bound) / (2 * self.bound)
        sdf_n = jnp.clip((point_sdf + 0.2) / 0.8, 0.0, 1.0)
        vert_feat = hash_grid_encode(
            jnp.concatenate([pc_n, sdf_n], axis=-1),
            params["encoder"], self.spec)                        # (V, 32)
        vert_feat = jnp.concatenate(
            [knn_att_per_vertex[:, None], vert_feat, learnable_points],
            axis=-1)
        if concat_map is not None:
            vert_feat = vert_feat[concat_map]
        return vert_feat

    def apply(self, params, xyz: jnp.ndarray, knn_points: jnp.ndarray,
              point_norms: jnp.ndarray, knn_idxs: jnp.ndarray,
              knn_att_per_vertex: jnp.ndarray | None = None,
              surface_points: jnp.ndarray | None = None,
              point_sdf: jnp.ndarray | None = None,
              learnable_points: jnp.ndarray | None = None,
              concat_map: jnp.ndarray | None = None,
              vert_feat: jnp.ndarray | None = None,
              enc_dtype=None, vert_groups=None, **_):
        """``knn_idxs`` address either the base cloud (concat_map=None) or
        the concatenated [base; FPS levels] cloud (concat_map maps
        concatenated rows to base indices).  Pass a precomputed
        ``vert_feat`` (:meth:`vertex_features`) to share the per-vertex
        table across chunked calls; otherwise it is built here.
        ``vert_groups`` declares the static per-scale (row range, lane
        range) structure of the concat cloud for the scatter-free
        aggregation backward (see ops.vertagg.knn_weighted_agg)."""
        N, k = knn_idxs.shape[0], knn_idxs.shape[2]

        # inside/outside + distance from the k-NN cloud (no-grad block,
        # occnerf_mlp.py:146-157)
        direction = jax.lax.stop_gradient(xyz[:, None, :] - knn_points)
        dots = jnp.einsum("nkd,nkd->nk", direction, point_norms)
        inside = jnp.sum(dots < 0, axis=1) > k * 0.5
        dist = jnp.mean(_safe_norm(direction, axis=-1), axis=1,
                        keepdims=True)
        dist = jnp.where(inside[:, None], -dist, dist)
        dist = jax.lax.stop_gradient(dist)
        normed_dist = jnp.clip((dist + 0.2) / 0.5, 0.0, 1.0)

        # normal-cosine-weighted surface point from the 3 nearest
        # (occnerf_mlp.py:164-167)
        knn_n = (knn_points + self.bound) / (2 * self.bound)
        att = jnp.abs(_cosine_similarity(direction[:, :3],
                                         point_norms[:, :3]))[..., None]
        surf = jnp.sum(att * knn_n[:, :3], axis=1) / jnp.sum(att, axis=1)
        # surf/normed_dist derive from statics and stop-gradients: the
        # per-sample encode needs no input grads -> MXU kernel eligible
        h_enc = _encode_no_input_grad(
            jax.lax.stop_gradient(
                jnp.concatenate([surf, normed_dist], axis=-1)),
            params["encoder"], self.spec, enc_dtype)             # (N, 32)

        # per-vertex features gathered over the 4x10 neighbourhood
        # (occnerf_mlp.py:171-178).  The visibility counter rides the same
        # gather as lane 0 — scalar gathers cost ~70 ms/chunk on TPU and
        # the indices are identical.
        if vert_feat is None:
            vert_feat = self.vertex_features(
                params, knn_att_per_vertex, surface_points, point_sdf,
                learnable_points, concat_map)
        flat_idx = knn_idxs.reshape(N, -1)                       # (N, 4k)
        from .. import ops as _ops
        from ..ops import vertagg as _vertagg
        backend = _ops.VERTAGG_BACKEND
        if backend == "auto":
            backend = ("pallas" if _jax.default_backend() == "tpu"
                       and _vertagg.supports(vert_feat.shape[0],
                                             vert_feat.shape[1],
                                             flat_idx.shape[1]) else "xla")
        if backend == "pallas":
            # attention lane via the vectorized ROW gather + e0 contraction
            # under stop_gradient — a 1-D scalar take of col 0 lowers to
            # the ~7 ns/element scalar loop (measured +160 ms/step), and
            # the detached row gather has no scatter backward; the 36-lane
            # aggregation and its table gradient then run as one-hot MXU
            # matmuls, so the scatter-add VJP disappears entirely
            g_sg = jax.lax.stop_gradient(vert_feat)[flat_idx]    # (N,4k,36)
            e0 = jnp.zeros((g_sg.shape[-1],), g_sg.dtype).at[0].set(1.0)
            knn_att = jnp.einsum("nkc,c->nk", g_sg, e0)          # (N,4k)
            atts_sm, var = self._att_normalize(knn_att)
            agg36 = _vertagg.knn_weighted_agg(
                vert_feat, flat_idx, jax.lax.stop_gradient(atts_sm),
                compute_dtype=enc_dtype, groups=vert_groups)     # (N,36)
        else:
            gathered = vert_feat[flat_idx]                       # (N,4k,36)
            # extract the visibility lane as a contraction (a strided
            # lane-0 slice forces transposed layouts + copies, ~45 ms/step
            # measured)
            e0 = jnp.zeros((gathered.shape[-1],),
                           gathered.dtype).at[0].set(1.0)
            knn_att = jax.lax.stop_gradient(
                jnp.einsum("nkc,c->nk", gathered, e0))           # (N,4k)
            agg36, var = self.simple_agg(knn_att, gathered)
        agg = agg36[:, 1:]                               # drop the att lane

        h = jnp.concatenate([agg, var, h_enc], axis=-1)
        for p in params["pts_linears"]:
            h = jax.nn.relu(linear(p, h))
        h = linear(params["geo_linear"], h)
        sigma = h[..., :1]

        h = jnp.concatenate([h[..., 1:], agg, h_enc], axis=-1)
        for p in params["rgb_linears"]:
            h = jax.nn.relu(linear(p, h))
        rgb = linear(params["output_linear"], h)

        return jnp.concatenate([rgb, sigma, dist], axis=-1)
