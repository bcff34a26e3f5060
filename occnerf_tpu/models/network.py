"""The OccNeRF network as a pure function over parameter/state pytrees.

Behavioral spec: `core/nets/occnerf/network.py` (forward recipe in
SURVEY.md §2.3).  Architectural differences from the reference, by design:

- No ``nn.DataParallel`` / chunked ``netchunk`` loop: the whole ray batch is
  evaluated in one jitted graph; multi-chip scaling shards the ray axis over
  a ``jax.sharding.Mesh`` (see ``occnerf_tpu.parallel``).
- The 24x ``grid_sample`` python loop collapses into one vectorized
  gather-lerp (``ops.trilinear.sample_motion_fields``).
- PyKeOps block-sparse KNN becomes an MXU distance-matmul + top-k
  (``ops.knn.multiscale_knn``).
- The CUDA hash-grid encoder becomes ``ops.hashgrid``.
- The ``point_counter`` side-effect (`network.py:517`) becomes explicit
  carried state: forward returns the updated counter.

Quirks reproduced deliberately (SURVEY.md §7 hard-part 6): ``point_dist``
has shape (V, 1) broadcasting over xyz; the pose refiner activates at eval
because ``eval_iter >= kick_in_iter``; the non-rigid embedding is all-zero
before ``kick_in_iter``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
from jax import ad_checkpoint
import jax.numpy as jnp

from ..config import cfg as global_cfg
from ..ops.knn import knn, multiscale_knn_concat
from ..ops.raymarch import raw2outputs, sample_zvals, stratify_zvals
from ..ops.trilinear import (build_obs_proxy, pool_dilate_volume,
                             sample_motion_fields, sample_motion_proxy,
                             sample_obs_proxy)
from ..utils.mesh import multiscale_fps_indices, vertex_normals
from .canonical import OccNeRFCanonicalMLP, VanillaCanonicalMLP, \
    _cosine_similarity, _safe_norm
from .embedders import fourier_embed, fourier_out_dim, hannw_fourier_embed
from .motion import motion_basis
from .mweight import DeconvVolumeDecoder, SelfVolumeDecoder
from .nonrigid import NonRigidMotionMLP
from .pose_refiner import BodyPoseRefiner


@dataclasses.dataclass(frozen=True)
class NetworkConfig:
    """Static configuration distilled from the yacs cfg node."""

    total_bones: int = 24
    n_samples: int = 128
    chunk: int = 8192
    # training rays are chunked + rematerialized: the per-sample KNN
    # feature tensors (N, 4k, C) otherwise blow past HBM with AD residuals
    train_chunk: int = 1024
    # eval/render ray chunk for the occnerf MLP (no AD residuals, but the
    # gathered (N*S, 4k, 35->128-lane) feature tensor still bounds HBM)
    eval_chunk: int = 2048
    # occupancy-guided sample compaction (beyond-reference, tpu knob):
    # query the canonical MLP only for the top `sample_compaction`
    # fraction of samples per chunk ranked by foreground likelihood.
    # Dropped samples contribute alpha = 0 (exactly what the reference's
    # mask multiply gives them when their likelihood is ~0); the
    # completeness loss stays exact via the origin-probe correction
    # (every zero-likelihood sample maps to the canonical origin).
    # 1.0 disables.
    sample_compaction: float = 1.0
    # eval/render-path compaction fraction; < 0 (default) follows
    # sample_compaction.  The no-grad path tolerates a lower fraction
    # than training (no gradient flows through dropped rows, and eval
    # exactness is checkable per frame), so it is a separate knob.
    eval_sample_compaction: float = -1.0
    bbox_offset: float = 0.3
    knn_k: int = 10
    sdf_k: int = 3
    knn_backend: str = "approx"
    # matmul input dtype of the stop-gradient compaction-ranking pass
    # (two-pass training) and of the no-grad eval/render path; bfloat16
    # ~halves the two Pallas kernels' MXU time (cfg.tpu.* knobs)
    rank_compute_dtype: str = "float32"
    eval_compute_dtype: str = "float32"
    # rank compaction candidates with the pooled half-res upper-bound
    # proxy volume instead of the full-res motion pass (~4x cheaper
    # ranking; kept rows still get the exact full-res pass)
    motion_rank_proxy: bool = False
    # EVAL-path only: bake the per-bone ranking bound into ONE
    # observation-space volume per frame (ops/trilinear.build_obs_proxy)
    # so ranking costs 1 lookup/sample instead of total_bones (~24x less
    # ranking MXU work).  Requires motion_rank_proxy; no effect on
    # training (per-item motion transforms would need a rebuild per
    # item, and the train ranking pass is a much smaller share of step
    # time).  Gated like every eval knob on a fixed-checkpoint metric
    # A/B before promotion (docs/ROADMAP.md).
    obs_rank_proxy: bool = False

    canonical_module: str = "core.nets.occnerf.canonical_mlps.occnerf_mlp"
    cnl_mlp_depth: int = 4
    cnl_mlp_width: int = 256
    cnl_multires: int = 10
    cnl_i_embed: int = 0
    # hash-grid geometry (occnerf_mlp.py:45); shrinkable for tests
    cnl_num_levels: int = 16
    cnl_level_dim: int = 2
    cnl_base_resolution: int = 16
    cnl_log2_hashmap_size: int = 19

    mweight_module: str = \
        "core.nets.occnerf.mweight_vol_decoders.deconv_vol_decoder"
    mweight_embedding_size: int = 256
    mweight_volume_size: int = 32
    # 1024 = reference-exact ConvDecoder3D plan; smaller values shrink the
    # deconv stack for memory-limited test meshes (TPU extension)
    mweight_base_channels: int = 1024

    nr_multires: int = 6
    nr_i_embed: int = 0
    nr_condition_size: int = 69
    nr_mlp_width: int = 128
    nr_mlp_depth: int = 6
    nr_skips: tuple = (4,)
    nr_kick_in_iter: int = 1_000_000
    nr_full_band_iter: int = 50_000

    pose_embedding_size: int = 69
    pose_mlp_width: int = 256
    pose_mlp_depth: int = 4
    pose_kick_in_iter: int = 0
    train_maxiter: int = 50_000

    @staticmethod
    def from_cfg(c=None) -> "NetworkConfig":
        c = c if c is not None else global_cfg
        return NetworkConfig(
            total_bones=c.total_bones,
            n_samples=c.N_samples,
            chunk=c.get("tpu", {}).get("eval_ray_bucket", 8192) or 8192,
            train_chunk=int(c.get("tpu", {}).get("train_chunk", 1024)),
            eval_chunk=int(c.get("tpu", {}).get("eval_chunk", 2048)),
            sample_compaction=float(
                c.get("tpu", {}).get("sample_compaction", 1.0)),
            eval_sample_compaction=float(
                c.get("tpu", {}).get("eval_sample_compaction", -1.0)),
            bbox_offset=c.bbox_offset,
            knn_backend=c.get("tpu", {}).get("knn_backend", "approx"),
            rank_compute_dtype=c.get("tpu", {}).get(
                "rank_compute_dtype", "float32"),
            eval_compute_dtype=c.get("tpu", {}).get(
                "eval_compute_dtype", "float32"),
            motion_rank_proxy=bool(c.get("tpu", {}).get(
                "motion_rank_proxy", False)),
            obs_rank_proxy=bool(c.get("tpu", {}).get(
                "obs_rank_proxy", False)),
            canonical_module=c.canonical_mlp.module,
            cnl_mlp_depth=c.canonical_mlp.mlp_depth,
            cnl_mlp_width=c.canonical_mlp.mlp_width,
            cnl_multires=c.canonical_mlp.multires,
            cnl_i_embed=c.canonical_mlp.i_embed,
            # hash-grid geometry overridable per config; <= 2^15 selects
            # the MXU one-hot kernel on TPU (hashgrid_pallas)
            cnl_num_levels=c.canonical_mlp.get("num_levels", 16),
            cnl_level_dim=c.canonical_mlp.get("level_dim", 2),
            cnl_base_resolution=c.canonical_mlp.get("base_resolution", 16),
            cnl_log2_hashmap_size=c.canonical_mlp.get(
                "log2_hashmap_size", 19),
            mweight_module=c.mweight_volume.module,
            mweight_embedding_size=c.mweight_volume.embedding_size,
            mweight_volume_size=c.mweight_volume.volume_size,
            mweight_base_channels=c.mweight_volume.get(
                "base_channels", 1024),
            nr_multires=c.non_rigid_motion_mlp.multires,
            nr_i_embed=c.non_rigid_motion_mlp.i_embed,
            nr_condition_size=c.non_rigid_motion_mlp.condition_code_size,
            nr_mlp_width=c.non_rigid_motion_mlp.mlp_width,
            nr_mlp_depth=c.non_rigid_motion_mlp.mlp_depth,
            nr_skips=tuple(c.non_rigid_motion_mlp.skips),
            nr_kick_in_iter=c.non_rigid_motion_mlp.kick_in_iter,
            nr_full_band_iter=c.non_rigid_motion_mlp.full_band_iter,
            pose_embedding_size=c.pose_decoder.embedding_size,
            pose_mlp_width=c.pose_decoder.mlp_width,
            pose_mlp_depth=c.pose_decoder.mlp_depth,
            pose_kick_in_iter=c.pose_decoder.get("kick_in_iter", 0),
            train_maxiter=c.train.maxiter,
        )

    @property
    def non_rigid_inert_in_train(self) -> bool:
        """True when the hann-window alpha stays <= 0 for every training
        iteration (kick_in >= maxiter — all shipped configs): the
        positional embedding is then all-zero, so the non-rigid offset is
        a PER-FRAME CONSTANT (the pose condition does not vary per
        sample) — computable on one row and broadcast, exactly."""
        return self.nr_kick_in_iter >= self.train_maxiter

    @property
    def pose_refiner_inert_in_train(self) -> bool:
        """True when the pose refiner cannot activate within the training
        schedule (kick_in > maxiter — the shipped configs set 2e6/1e7 vs
        maxiter 1e5, `configs/occnerf/zju_mocap/387/occnerf.yaml:32-33`).
        Then the motion basis depends on no trainable parameter and its
        coordinate gradients are statically zero — stop-gradient lets XLA
        DCE the coordinate-gradient Pallas kernel from the train step."""
        return self.pose_kick_in_iter > self.train_maxiter


@jax.custom_vjp
def _permute_rows(x, idx, inv_idx):
    """Row permutation whose backward is ALSO a gather (`g[inv of idx]`).

    The default VJP of fancy indexing is a scatter-add — ~70 ns/element on
    TPU.  For a bijective permutation the transpose is just the inverse
    gather, which rides the fast row-gather path."""
    return x[idx]


def _permute_rows_fwd(x, idx, inv_idx):
    return x[idx], inv_idx


def _permute_rows_bwd(inv_idx, g):
    return g[inv_idx], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


class Network:
    """Holds submodule objects + static config; all compute is pure fns."""

    def __init__(self, config: Optional[NetworkConfig] = None):
        self.cfg = config or NetworkConfig.from_cfg()
        c = self.cfg

        # 'canonical_mlps.occnerf' (ocmotion configs) and
        # 'canonical_mlps.occnerf_mlp' both select the OccNeRF MLP
        self.is_occnerf_mlp = "mlp_rgb_sigma" not in c.canonical_module

        self.pose_refiner = BodyPoseRefiner(
            embedding_size=c.pose_embedding_size, mlp_width=c.pose_mlp_width,
            mlp_depth=c.pose_mlp_depth, total_bones=c.total_bones)

        nr_embed_dim = fourier_out_dim(c.nr_multires, 3, include_input=False)
        self.non_rigid_mlp = NonRigidMotionMLP(
            pos_embed_size=nr_embed_dim,
            condition_code_size=c.nr_condition_size,
            mlp_width=c.nr_mlp_width, mlp_depth=c.nr_mlp_depth,
            skips=c.nr_skips)

        if "self_vol" in c.mweight_module:
            self.mweight_decoder = SelfVolumeDecoder(
                embedding_size=c.mweight_embedding_size,
                volume_size=c.mweight_volume_size,
                total_bones=c.total_bones)
        else:
            self.mweight_decoder = DeconvVolumeDecoder(
                embedding_size=c.mweight_embedding_size,
                volume_size=c.mweight_volume_size,
                total_bones=c.total_bones,
                base_channels=c.mweight_base_channels)

        self.cnl_embed_dim = fourier_out_dim(c.cnl_multires, 3, True)
        self.cnl_mlp = None  # built in generate_neural_points (needs bound)

    # ------------------------------------------------------------------
    # neural point cloud (reference network.py:90-146)
    # ------------------------------------------------------------------
    def generate_neural_points(self, verts: np.ndarray, joints: np.ndarray,
                               faces: np.ndarray) -> Dict[str, Any]:
        """Build statics from the zero-pose avg-betas SMPL mesh.

        Returns the ``statics`` pytree: frozen point cloud, vertex normals,
        FPS pyramid, canonical bound.  (The caller runs SMPL on the host and
        passes verts/joints/faces — keeps this module device-only.)
        """
        c = self.cfg
        min_xyz = joints.min(0) - c.bbox_offset
        max_xyz = joints.max(0) + c.bbox_offset
        bound = float(np.max(np.abs(np.concatenate([min_xyz, max_xyz]))))

        normals = vertex_normals(verts, faces)
        fps_idx = multiscale_fps_indices(verts, levels=3, ratio=0.25)

        if self.is_occnerf_mlp:
            self.cnl_mlp = OccNeRFCanonicalMLP(
                mlp_depth=c.cnl_mlp_depth, mlp_width=c.cnl_mlp_width,
                bound=bound, num_levels=c.cnl_num_levels,
                level_dim=c.cnl_level_dim,
                base_resolution=c.cnl_base_resolution,
                log2_hashmap_size=c.cnl_log2_hashmap_size)
        else:
            self.cnl_mlp = VanillaCanonicalMLP(
                input_ch=self.cnl_embed_dim, mlp_depth=c.cnl_mlp_depth,
                mlp_width=c.cnl_mlp_width)

        return {
            "point_base": jnp.asarray(verts, jnp.float32),
            "point_norms": jnp.asarray(normals, jnp.float32),
            # fused (position, normal) rows: one gather instead of two
            "base_and_norms": jnp.asarray(
                np.concatenate([verts, normals], axis=-1), jnp.float32),
            "fps_idx": tuple(jnp.asarray(i, jnp.int32) for i in fps_idx),
            # rows of the concatenated [base; FPS levels] KNN cloud -> base
            # vertex index (static: FPS runs once at init)
            "concat_map": jnp.asarray(
                np.concatenate([np.arange(len(verts))] + list(fps_idx)),
                jnp.int32),
            "bound": bound,
            "detailed_bound": jnp.asarray(
                np.stack([min_xyz, max_xyz]), jnp.float32),
        }

    # ------------------------------------------------------------------
    def init(self, key: jax.Array, statics: Dict[str, Any]
             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Init (params, state). Call after generate_neural_points."""
        assert self.cnl_mlp is not None, \
            "generate_neural_points must run before init"
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        n_verts = statics["point_base"].shape[0]
        params = {
            "mweight_vol_decoder": self.mweight_decoder.init(k1),
            "non_rigid_mlp": self.non_rigid_mlp.init(k2),
            "pose_decoder": self.pose_refiner.init(k3),
            "cnl_mlp": self.cnl_mlp.init(k4),
            # U(-1e-4, 1e-4), shape (V, 1) broadcasting over xyz —
            # reference quirk preserved (network.py:108-110)
            "point_dist": jax.random.uniform(
                k5, (n_verts, 1), minval=-1e-4, maxval=1e-4,
                dtype=jnp.float32),
        }
        state = {"point_counter": jnp.ones((n_verts,), jnp.float32)}
        return params, state

    # ------------------------------------------------------------------
    # forward pieces
    # ------------------------------------------------------------------
    def _refine_pose(self, params, dst_Rs, dst_posevec, iter_val):
        """Right-multiply pose-refiner deltas into non-root rotations when
        iter >= kick_in (network.py:558-571); where-gated so the same graph
        serves train and eval."""
        out = self.pose_refiner.apply(params["pose_decoder"],
                                      dst_posevec[None])
        refined = out["Rs"][0]                                # (B-1, 3, 3)
        merged = jnp.concatenate(
            [dst_Rs[:1], dst_Rs[1:] @ refined], axis=0)
        apply = iter_val >= self.cfg.pose_kick_in_iter
        return jnp.where(apply, merged, dst_Rs)

    def _vertex_quantities(self, params, statics):
        """Per-vertex surface aggregate + signed distance
        (network.py:263-284), computed once per forward."""
        point_base = statics["point_base"]
        point_cloud = point_base + params["point_dist"]       # (V,1)->(V,3)
        _, kidx = knn(jax.lax.stop_gradient(point_cloud), point_base,
                      self.cfg.sdf_k, backend="exact")
        knn_base = point_base[kidx]                            # (V, 3, 3)
        direction = point_cloud[:, None, :] - knn_base
        norms = statics["point_norms"][kidx]                   # (V, 3, 3)
        att = jnp.abs(_cosine_similarity(direction, norms))[..., None]
        surface = jnp.sum(att * knn_base, axis=1) / jnp.sum(att, axis=1)
        inside = jnp.sum(
            jnp.einsum("vkd,vkd->vk", direction, norms) < 0, axis=1
        ) > self.cfg.sdf_k * 0.5
        # _safe_norm: the self-neighbour direction equals point_dist and
        # can be exactly 0 (see canonical._safe_norm)
        sdf = jnp.mean(_safe_norm(direction, axis=-1), axis=1,
                       keepdims=True)
        sdf = jnp.where(inside[:, None], -sdf, sdf)
        return point_cloud, surface, sdf

    def _query_canonical(self, params, statics, state, xyz, iter_val,
                         non_rigid_input, ignore_non_rigid,
                         vertex_quant, vert_feat, training=False,
                         enc_dtype=None):
        """Per-sample MLP query (network.py:202-304): non-rigid offset,
        multiscale KNN, visibility attention, canonical MLP."""
        c = self.cfg
        if not ignore_non_rigid:
            if training and c.non_rigid_inert_in_train:
                # all-zero embedding + per-frame condition: the offset is
                # one MLP evaluation broadcast over samples (exact, incl.
                # gradients — broadcast VJP sums the cotangents)
                zero_embed = jnp.zeros(
                    (1, fourier_out_dim(c.nr_multires, 3,
                                        include_input=False)), xyz.dtype)
                trans = self.non_rigid_mlp.apply(
                    params["non_rigid_mlp"], zero_embed,
                    jnp.zeros((1, 3), xyz.dtype),
                    non_rigid_input[None])["xyz"]
                xyz = xyz + trans
            else:
                embed = hannw_fourier_embed(xyz, c.nr_multires, iter_val,
                                            c.nr_kick_in_iter,
                                            c.nr_full_band_iter)
                cond = jnp.broadcast_to(non_rigid_input[None],
                                        (xyz.shape[0],
                                         non_rigid_input.shape[-1]))
                xyz = self.non_rigid_mlp.apply(
                    params["non_rigid_mlp"], embed, xyz, cond)["xyz"]

        if not self.is_occnerf_mlp:
            raws = self.cnl_mlp.apply(
                params["cnl_mlp"],
                pos_embed=fourier_embed(xyz, c.cnl_multires))
            return raws, xyz

        # indices address the concatenated [base; fps levels] cloud — the
        # per-neighbour FPS re-index is a 23M scalar gather otherwise
        idx, _ = multiscale_knn_concat(
            jax.lax.stop_gradient(xyz), statics["point_base"],
            statics["fps_idx"], c.knn_k, backend=c.knn_backend)
        idx = ad_checkpoint.checkpoint_name(idx, "knn_idx")     # (N, 4, k)
        bn = statics["base_and_norms"][idx[:, 0]]               # (N, k, 6)
        knn_points = bn[..., :3]
        point_norms = bn[..., 3:]

        # static per-scale structure of the concat cloud: lanes
        # [s*k, (s+1)*k) of the flattened neighbour axis address rows
        # [off_s, off_s + V_s) — lets the vertagg backward build each
        # scale's one-hot from its own k lanes only (4x cheaper at
        # reference scale; see ops/vertagg.py)
        sizes = ((statics["point_base"].shape[0],)
                 + tuple(f.shape[0] for f in statics["fps_idx"]))
        groups, off = [], 0
        for s, v in enumerate(sizes):
            groups.append((off, off + v, s * c.knn_k, (s + 1) * c.knn_k))
            off += v
        raws = self.cnl_mlp.apply(
            params["cnl_mlp"], xyz=xyz, knn_points=knn_points,
            point_norms=point_norms, knn_idxs=idx, vert_feat=vert_feat,
            enc_dtype=enc_dtype, vert_groups=tuple(groups))
        return raws, xyz

    def _compaction_frac(self, training: bool) -> float:
        """Effective sample-compaction fraction for this pass: training
        uses ``sample_compaction``; eval/render uses
        ``eval_sample_compaction`` when set (>= 0), else follows."""
        c = self.cfg
        if not training and c.eval_sample_compaction >= 0:
            return c.eval_sample_compaction
        return c.sample_compaction

    def _render_chunk(self, params, statics, state, rays_o, rays_d, near,
                      far, ray_valid, bgcolor, iter_val, non_rigid_input,
                      motion_scale_Rs, motion_Ts, motion_weights_vol,
                      cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                      *, training, ignore_non_rigid, perturb, rng,
                      vertex_quant, vert_feat, proxy_vol=None,
                      obs_proxy=None):
        c = self.cfg
        n = rays_o.shape[0]
        z_vals = sample_zvals(near, far, c.n_samples)
        if perturb > 0.0:
            z_vals = stratify_zvals(rng, z_vals)

        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        ns_all = n * c.n_samples
        frac = self._compaction_frac(training)
        K = min(ns_all, -(-int(ns_all * frac) // 512) * 512)
        compact = self.is_occnerf_mlp and K < ns_all
        # Under compaction during training the motion backward only needs
        # the kept rows: dropped rows carry no gradient anywhere (their
        # compositing mask is a stop-gradded zero and their canonical
        # points are never queried), so the full-N pass runs with
        # stop-gradded motion inputs (it feeds only the ranking and
        # stop-grad consumers) and a second differentiable pass covers
        # just the kept K rows.  That removes the dropped rows' share of
        # the motion kernel's backward — the weight-table scatter and the
        # coordinate gradients — for the cost of a K-row extra forward.
        # Exactness vs the single-pass full backward is asserted by
        # tests/test_network.py::test_sample_compaction_exact.
        two_pass = training and compact
        # proxy ranking (cfg.tpu.motion_rank_proxy): skip the full-N
        # motion pass entirely — rank with the pooled half-res UPPER
        # BOUND volume (~4x cheaper) and run the exact full-res pass on
        # the kept rows only (train: differentiable; eval: no-grad).
        # proxy >= exact likelihood per sample, so compaction stays
        # exact whenever K covers every proxy-positive sample; when it
        # does not (the practical regime), ranking by the bound drops
        # marginally more low-mass samples than exact ranking (measured
        # 2.7% vs 1.8% of total mass at 0.375 — see pool_dilate_volume
        # and ROADMAP).
        use_proxy = compact and c.motion_rank_proxy and proxy_vol is not None
        sg = jax.lax.stop_gradient
        # per-call matmul dtype: the stop-gradded ranking pass and the
        # no-grad eval path may run bfloat16 (cfg.tpu.{rank,eval}_
        # compute_dtype); the differentiable train pass never does
        eval_dt = (c.eval_compute_dtype if not training
                   and c.eval_compute_dtype != "float32" else None)
        rank_dt = (c.rank_compute_dtype if (training and compact)
                   and c.rank_compute_dtype != "float32" else eval_dt)
        x_skel = fg_mask_raw = flat = None
        if use_proxy:
            if obs_proxy is not None and not training:
                # eval-only (cfg.tpu.obs_rank_proxy): the frame's bound
                # is baked into one observation-space volume — ranking
                # is a single lookup per sample instead of B bones
                ub = sample_obs_proxy(pts, *obs_proxy,
                                      compute_dtype=rank_dt)
            else:
                ub = sample_motion_proxy(
                    pts, sg(motion_scale_Rs), sg(motion_Ts), sg(proxy_vol),
                    cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                    fine_size=motion_weights_vol.shape[1],
                    compute_dtype=rank_dt)
            # padded rays must never crowd real samples out of the kept
            # set (and must composite to exactly bgcolor)
            fg_rank = ub * ray_valid[:, None, None]
        else:
            x_skel, fg_mask_raw = sample_motion_fields(
                pts, sg(motion_scale_Rs) if two_pass else motion_scale_Rs,
                sg(motion_Ts) if two_pass else motion_Ts,
                sg(motion_weights_vol) if two_pass else motion_weights_vol,
                cnl_bbox_min_xyz, cnl_bbox_scale_xyz,
                compute_dtype=rank_dt if two_pass else
                (eval_dt if not training else None))
            # padded rays (near = far = 0, ray_valid = 0) must composite
            # to exactly bgcolor: zero their foreground likelihood
            fg_mask = fg_mask_raw * ray_valid[:, None, None]
            fg_rank = fg_mask
            flat = x_skel.reshape(-1, 3)
        raw0 = None
        if compact:
            # occupancy-guided compaction: rank samples by foreground
            # likelihood and query only the top K (+ one probe of the
            # canonical origin, where every zero-likelihood sample lands
            # exactly — wsum == 0 means all corner weights were zero).
            # Dropped samples contribute exactly nothing: a kept-indicator
            # is multiplied into the compositing mask below (raw = 0 alone
            # would leak softplus(0) = ln2 density scaled by the sample's
            # small mask), and the completeness loss is corrected exactly
            # below.
            mflat = jax.lax.stop_gradient(fg_rank.reshape(-1))
            iota = jnp.arange(ns_all, dtype=jnp.int32)
            _, perm = jax.lax.sort_key_val(-mflat, iota)
            _, iperm = jax.lax.sort_key_val(perm, iota)
            # saved (not recomputed) under the training remat policy:
            # re-running both 131k-key sorts in the backward costs more
            # than the ~1 MB/chunk the int32 permutations occupy
            perm = ad_checkpoint.checkpoint_name(perm, "rank_perm")
            iperm = ad_checkpoint.checkpoint_name(iperm, "rank_perm")
            kept_rows = perm[:K]
            rv = jnp.broadcast_to(
                ray_valid[:, None], (n, c.n_samples)).reshape(-1)
            m_kept = None
            if two_pass or use_proxy:
                # exact motion pass on the kept rows only (two-pass
                # training: differentiable, bit-identical values to the
                # full-N pass; proxy eval: the only full-res pass at all)
                pts_kept = pts.reshape(-1, 3)[kept_rows]
                flat_kept, m_kept = sample_motion_fields(
                    pts_kept, motion_scale_Rs, motion_Ts,
                    motion_weights_vol, cnl_bbox_min_xyz,
                    cnl_bbox_scale_xyz,
                    compute_dtype=None if training else eval_dt)
                # rebuild the compositing mask from the kept-row values;
                # dropped rows are exactly 0 (no phantom density, no
                # gradient)
                m_sorted = jnp.concatenate(
                    [m_kept[:, 0] * rv[kept_rows],
                     jnp.zeros((ns_all - K,), m_kept.dtype)])
                fg_mask = _permute_rows(
                    m_sorted[:, None], iperm, perm).reshape(
                        n, c.n_samples, 1)
            else:
                flat_kept = flat[kept_rows]
            xyz_q = jnp.concatenate(
                [flat_kept, jnp.zeros((1, 3), flat_kept.dtype)], axis=0)
            raws_q, _ = self._query_canonical(
                params, statics, state, xyz_q, iter_val, non_rigid_input,
                ignore_non_rigid, vertex_quant, vert_feat,
                training=training, enc_dtype=eval_dt)
            raw0 = raws_q[K]
            raws_sorted = jnp.concatenate(
                [raws_q[:K],
                 jnp.zeros((ns_all - K, raws_q.shape[-1]), raws_q.dtype)],
                axis=0)
            raws = _permute_rows(raws_sorted, iperm, perm)
            if not (two_pass or use_proxy):
                # zero the compositing mask of dropped rows so they carry
                # no phantom density (sorted rank >= K == dropped); the
                # kept-pass branches already rebuilt fg_mask with exact
                # zeros
                kept = jax.lax.stop_gradient(
                    (iperm < K).astype(fg_mask.dtype)).reshape(
                        n, c.n_samples, 1)
                fg_mask = fg_mask * kept
        else:
            raws, _ = self._query_canonical(
                params, statics, state, flat, iter_val, non_rigid_input,
                ignore_non_rigid, vertex_quant, vert_feat,
                training=training, enc_dtype=eval_dt)
        raw = raws.reshape(n, c.n_samples, -1)

        out = raw2outputs(raw, fg_mask, z_vals, rays_d, bgcolor)
        result = {"rgb": out.rgb, "alpha": out.acc, "depth": out.depth}

        if training and self.is_occnerf_mlp:
            dist = raw[..., 4]                                  # (n, S)
            alpha_s = raw[..., 3]
            # reproduce network.py:491-499 exactly: the out-of-shell alpha
            # zeroing only feeds comp_loss (a no-op given dist_in gating,
            # kept for bit-parity)
            alpha_m = jnp.where(dist > 0.3, 0.0, alpha_s)
            dist_in = jax.lax.stop_gradient((dist < 0.0).astype(jnp.float32))
            comp = dist_in * jnp.exp(
                jnp.clip(-jax.nn.relu(alpha_m), -10.0, 0.0)) * 10.0
            comp = comp * ray_valid[:, None]  # padded rays contribute 0
            comp = comp.reshape(-1)
            if compact:
                # every zero-likelihood sample (dropped or kept) maps to
                # the canonical origin: gate per-sample comp on mask > 0
                # and add the origin probe's comp once per VALID zero-mask
                # sample — exact whenever no positive-mask sample was
                # dropped (K >= count(mask > 0))
                mask_pos = (fg_mask.reshape(-1) > 0.0).astype(jnp.float32)
                comp = comp * mask_pos
                d0 = raw0[4]
                a0 = jnp.where(d0 > 0.3, 0.0, raw0[3])
                in0 = jax.lax.stop_gradient(
                    (d0 < 0.0).astype(jnp.float32))
                c0 = in0 * jnp.exp(
                    jnp.clip(-jax.nn.relu(a0), -10.0, 0.0)) * 10.0
                if use_proxy:
                    # no full-N mask exists; valid zero-mass count =
                    # all valid rows minus the kept positive ones
                    # (dropped valid rows are zero-mass whenever no
                    # positive sample was dropped — the same exactness
                    # condition as the ranking itself)
                    n_pos_kept = jnp.sum(
                        (m_kept[:, 0] > 0.0).astype(jnp.float32)
                        * rv[kept_rows])
                    n_zero_valid = jnp.sum(ray_valid) * c.n_samples \
                        - n_pos_kept
                else:
                    n_zero_valid = jnp.sum(
                        ray_valid[:, None]
                        * (fg_mask_raw[..., 0] <= 0.0).astype(jnp.float32))
                comp = comp.at[0].add(c0 * n_zero_valid)
            result["comp_loss"] = comp

            # visibility counter update (network.py:501-517): canonical
            # points at ray termination, 10-NN into the learnable cloud
            depth_mask = jax.lax.stop_gradient(out.depth) > 0.5
            if use_proxy:
                # no full-N x_skel under proxy ranking: the termination
                # row always has alpha > 0 whenever depth > 0.5, and
                # positive-alpha rows are kept — fetch its canonical
                # point from the kept-pass values (rank < K there; the
                # clip only fires on depth-masked all-zero rays)
                flat_idx = (jnp.arange(n, dtype=jnp.int32) * c.n_samples
                            + out.term_idx.astype(jnp.int32))
                rank = jnp.clip(iperm[flat_idx], 0, K - 1)
                term_pts = flat_kept[rank]
            else:
                term_pts = jnp.take_along_axis(
                    x_skel, out.term_idx[:, None, None], axis=1)[:, 0]
            _, vidx = knn(jax.lax.stop_gradient(term_pts),
                          jax.lax.stop_gradient(vertex_quant[0]),
                          c.knn_k, backend=c.knn_backend)       # (n, k)
            w = depth_mask.astype(jnp.float32)
            inc = jnp.zeros_like(state["point_counter"]).at[
                vidx.reshape(-1)].add(jnp.repeat(w, c.knn_k))
            gate = (jnp.sum(depth_mask) > 1).astype(jnp.float32)
            result["counter_inc"] = inc * gate
        elif training:
            result["comp_loss"] = jnp.zeros((1,), jnp.float32)

        return result

    # ------------------------------------------------------------------
    def forward(self, params, statics, state, batch, iter_val, *,
                training: bool, ignore_non_rigid: bool = False,
                perturb: float = 0.0, rng: Optional[jax.Array] = None,
                chunk: Optional[int] = None):
        """Full forward (network.py:542-622).

        batch keys: rays (2,N,3), near/far (N,1), dst_Rs (B,3,3), dst_Ts
        (B,3), cnl_gtfms (B,4,4), motion_weights_priors (B+1,G,G,G),
        dst_posevec (69,), cnl_bbox_min_xyz/scale_xyz (3,), bgcolor (3,).

        Returns (outputs dict, new_state dict).
        """
        iter_val = jnp.asarray(iter_val, jnp.float32)
        dst_Rs = self._refine_pose(params, batch["dst_Rs"],
                                   batch["dst_posevec"], iter_val)

        non_rigid_input = jnp.where(
            iter_val < self.cfg.nr_kick_in_iter,
            jnp.zeros_like(batch["dst_posevec"]), batch["dst_posevec"])

        motion_scale_Rs, motion_Ts = motion_basis(
            dst_Rs, batch["dst_Ts"], batch["cnl_gtfms"])
        if training and self.cfg.pose_refiner_inert_in_train:
            # only the (inert) pose refiner feeds the motion basis —
            # coordinate grads are statically zero
            motion_scale_Rs = jax.lax.stop_gradient(motion_scale_Rs)
            motion_Ts = jax.lax.stop_gradient(motion_Ts)
        motion_weights_vol = self.mweight_decoder.apply(
            params["mweight_vol_decoder"],
            batch["motion_weights_priors"][None])[0]
        proxy_vol = None
        if (self.is_occnerf_mlp and self.cfg.motion_rank_proxy
                and self._compaction_frac(training) < 1.0):
            # half-res upper-bound volume for the compaction ranking,
            # built once per step (ranking is stop-gradient by design)
            proxy_vol = pool_dilate_volume(jax.lax.stop_gradient(
                motion_weights_vol[:self.cfg.total_bones]))

        vertex_quant = (self._vertex_quantities(params, statics)
                        if self.is_occnerf_mlp else None)
        if self.is_occnerf_mlp:
            # per-vertex feature table built once per step and shared
            # across ray chunks (its hash-encode scatter backward is the
            # expensive part — recomputing it per chunk costs ~100 ms)
            point_cloud, surface, sdf = vertex_quant
            vert_feat = self.cnl_mlp.vertex_features(
                params["cnl_mlp"],
                jax.lax.stop_gradient(state["point_counter"]),
                surface, sdf, point_cloud, statics["concat_map"])
        else:
            vert_feat = None

        rays_o, rays_d = batch["rays"][0], batch["rays"][1]
        near, far = batch["near"], batch["far"]
        ray_valid = batch.get("ray_valid")
        if ray_valid is None:
            ray_valid = jnp.ones((rays_o.shape[0],), jnp.float32)
        bgcolor = batch["bgcolor"]
        obs_proxy = None
        if (proxy_vol is not None and not training
                and self.cfg.obs_rank_proxy):
            # eval-only: bake the B-bone ranking bound into one
            # observation-space volume per frame (all chunks of a frame
            # share the motion transforms).  Every sample lies between
            # its ray's near/far endpoints, so the endpoints' AABB over
            # the valid rays bounds the frame's sample support.
            ends = jnp.stack([rays_o + rays_d * near,
                              rays_o + rays_d * far])        # (2, N, 3)
            v = (ray_valid > 0)[None, :, None]
            obs_min = jnp.min(jnp.where(v, ends, jnp.inf), axis=(0, 1))
            obs_max = jnp.max(jnp.where(v, ends, -jnp.inf), axis=(0, 1))
            # all-padded guard (never in practice): collapse to a point
            obs_min = jnp.where(jnp.isfinite(obs_min), obs_min, 0.0)
            obs_max = jnp.where(jnp.isfinite(obs_max), obs_max, 0.0)
            edt = (self.cfg.eval_compute_dtype
                   if self.cfg.eval_compute_dtype != "float32" else None)
            obs_proxy = build_obs_proxy(
                proxy_vol, motion_scale_Rs, motion_Ts,
                batch["cnl_bbox_min_xyz"], batch["cnl_bbox_scale_xyz"],
                obs_min, obs_max,
                fine_size=motion_weights_vol.shape[1], compute_dtype=edt)
        N = rays_o.shape[0]
        if chunk is None:
            if self.is_occnerf_mlp:
                # the per-sample KNN feature tensor (N*S, 4k, 35) lane-pads
                # 35 -> 128 on TPU: big eval chunks blow HBM.  Eval has no
                # AD residuals, so its cap is independent of train_chunk.
                chunk = self.cfg.train_chunk if training else min(
                    self.cfg.chunk, self.cfg.eval_chunk)
            else:
                chunk = self.cfg.chunk

        kwargs = dict(
            iter_val=iter_val, non_rigid_input=non_rigid_input,
            motion_scale_Rs=motion_scale_Rs, motion_Ts=motion_Ts,
            motion_weights_vol=motion_weights_vol,
            cnl_bbox_min_xyz=batch["cnl_bbox_min_xyz"],
            cnl_bbox_scale_xyz=batch["cnl_bbox_scale_xyz"],
            training=training, ignore_non_rigid=ignore_non_rigid,
            perturb=perturb, vertex_quant=vertex_quant,
            vert_feat=vert_feat, proxy_vol=proxy_vol, obs_proxy=obs_proxy)

        if N <= chunk:
            out = self._render_chunk(params, statics, state, rays_o, rays_d,
                                     near, far, ray_valid, bgcolor, rng=rng,
                                     **kwargs)
        else:
            assert N % chunk == 0, (
                f"ray count {N} must be padded to a multiple of the chunk "
                f"size {chunk}")
            nb = N // chunk
            keys = (jax.random.split(rng, nb) if rng is not None
                    else jnp.zeros((nb, 2), jnp.uint32))

            def body(args):
                ro, rd, nr, fr, rv, k = args
                return self._render_chunk(params, statics, state, ro, rd,
                                          nr, fr, rv, bgcolor, rng=k,
                                          **kwargs)

            if training:
                # rematerialize per chunk: keeps AD residuals to one
                # chunk's worth (the reference's netchunk memory knob).
                # The expensive non-differentiable intermediates (KNN
                # indices, the no-input-grad hash encode) are saved, not
                # recomputed — together they dominate forward time.
                policy = jax.checkpoint_policies.save_only_these_names(
                    "knn_idx", "hash_enc", "motion_w", "rank_perm")
                body = jax.checkpoint(body, policy=policy)

            mapped = jax.lax.map(body, (
                rays_o.reshape(nb, chunk, 3), rays_d.reshape(nb, chunk, 3),
                near.reshape(nb, chunk, 1), far.reshape(nb, chunk, 1),
                ray_valid.reshape(nb, chunk), keys))
            # per-ray outputs flatten over chunks; per-vertex accumulators
            # (counter_inc) sum over chunks
            counter = mapped.pop("counter_inc", None)
            out = jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:]), mapped)
            if counter is not None:
                out["counter_inc"] = jnp.sum(counter, axis=0)

        new_state = dict(state)
        if "counter_inc" in out:
            new_state["point_counter"] = state["point_counter"] \
                + out.pop("counter_inc")
        return out, new_state
