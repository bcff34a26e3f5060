"""Trilinear volume sampling and the fused inverse-LBS motion-field sampler.

Replaces the reference's per-bone Python loop of 24 ``F.grid_sample`` calls
(`core/nets/occnerf/network.py:351-402`) with one vectorized gather-lerp:
all 24 bone transforms are applied as a single batched matmul and all
24 weight channels are sampled in one shot.

TPU note: the 8 corner reads are FLAT 1-D ``jnp.take`` gathers from the
flattened ``(B*D*H*W,)`` volume.  Multi-dimensional fancy indexing lowers
to a scalar-slice XLA gather that runs ~5000x slower on TPU (measured
2.1 s vs 0.4 ms for 24x786k samples on v5e); the flat form hits the fast
gather path, and its transpose (the scatter-add gradient into the weight
volume) is equally fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import ad_checkpoint


def _flat_trilinear(vols: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                    fz: jnp.ndarray) -> jnp.ndarray:
    """Batched trilinear lerp with zero padding outside the volume.

    Args:
        vols: (B, D, H, W) one volume per batch row.
        fx/fy/fz: (B, N) fractional voxel coordinates (align_corners=True
            scale: 0 .. size-1), indexing W/H/D respectively.

    Returns:
        (B, N) interpolated values; 0 where any corner falls outside.
    """
    B, D, H, W = vols.shape
    flat = vols.reshape(-1)
    b_off = (jnp.arange(B, dtype=jnp.int32) * (D * H * W))[:, None]

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx, ty, tz = fx - x0, fy - y0, fz - z0

    out = jnp.zeros(fx.shape, vols.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx = x0 + dx
                cy = y0 + dy
                cz = z0 + dz
                inb = ((cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                       & (cz >= 0) & (cz <= D - 1))
                ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                idx = b_off + (iz * H + iy) * W + ix
                w = ((tx if dx else 1.0 - tx)
                     * (ty if dy else 1.0 - ty)
                     * (tz if dz else 1.0 - tz))
                out = out + jnp.where(inb, w, 0.0) * jnp.take(flat, idx)
    return out


def grid_sample_3d(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample with zero padding, align_corners=True.

    Matches ``F.grid_sample(vol[None, None], grid, padding_mode='zeros',
    align_corners=True)`` semantics for a single-channel volume.

    Args:
        vol: (D, H, W) volume, indexed [z, y, x].
        coords: (..., 3) normalized coordinates in [-1, 1], ordered (x, y, z)
            where x indexes W (the fastest axis) — the grid_sample convention.

    Returns:
        (...,) sampled values; zero outside the volume.
    """
    D, H, W = vol.shape
    shape = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    # align_corners=True: -1 -> 0, +1 -> size-1
    fx = (c[:, 0] + 1.0) * 0.5 * (W - 1)
    fy = (c[:, 1] + 1.0) * 0.5 * (H - 1)
    fz = (c[:, 2] + 1.0) * 0.5 * (D - 1)
    out = _flat_trilinear(vol[None], fx[None], fy[None], fz[None])[0]
    return out.reshape(shape)


def pool_dilate_volume(vols: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Conservative coarse proxy of per-bone weight volumes.

    Max-pool each (B, D, D, D) volume by ``factor`` and dilate by one
    coarse cell (3^3 max).  The result, TENT-INTERPOLATED at the scaled
    coordinate ``f/factor``, is an upper bound of the exact fine-grid
    trilinear value at ``f`` for every in-support sample: both fine
    corner cells of ``f`` lie in {floor(f/factor), floor(f/factor)+1},
    and the 1-cell dilation makes every tent-support cell dominate both
    — so the tent combination >= exact.  Used by the compaction-ranking
    pass (:func:`sample_motion_proxy`): the proxy-positive set is a
    superset of the exact-positive set, so compaction is exact whenever
    K covers every PROXY-positive sample.  Beyond that (K smaller than
    the proxy-positive count — the practical regime, since softmax
    volumes are positive almost everywhere in-bbox), samples are ranked
    by the upper bound rather than the exact mass: a dilation-inflated
    zero-mass sample can then outrank a genuinely positive one.
    Measured on the flagship synthetic workload at compaction 0.375:
    2.7% of total exact mass dropped under proxy ranking vs 1.8% under
    exact ranking, quality-neutral in two 100-iter convergence soaks
    (docs/ROADMAP.md).
    """
    assert vols.shape[1] % factor == 0, (
        f"volume side {vols.shape[1]} not divisible by pool factor "
        f"{factor}: VALID pooling would drop the last rows and break "
        "the upper-bound property")
    pooled = jax.lax.reduce_window(
        vols, -jnp.inf, jax.lax.max,
        (1, factor, factor, factor), (1, factor, factor, factor), "VALID")
    return jax.lax.reduce_window(
        pooled, -jnp.inf, jax.lax.max, (1, 3, 3, 3), (1, 1, 1, 1), "SAME")


def sample_motion_proxy(pts: jnp.ndarray,
                        motion_scale_Rs: jnp.ndarray,
                        motion_Ts: jnp.ndarray,
                        proxy_vols: jnp.ndarray,
                        cnl_bbox_min_xyz: jnp.ndarray,
                        cnl_bbox_scale_xyz: jnp.ndarray,
                        fine_size: int = 32,
                        use_pallas: bool | None = None,
                        compute_dtype=None) -> jnp.ndarray:
    """Upper bound of the foreground likelihood (weight sum) per sample.

    Same transform math as :func:`sample_motion_fields`, but looks up the
    pooled+dilated proxy volumes (:func:`pool_dilate_volume`) at the
    coarse coordinate — per-bone cost scales with the coarse table size
    (16^2 = 256 rows vs 32^2 = 1024: ~4x cheaper on the MXU one-hot
    kernel).  Returns (..., 1) with ``proxy >= fg_likelihood`` for every
    sample; out-of-support samples return exactly 0, like the fine
    kernel's zero padding.
    """
    orig_shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)
    B = motion_scale_Rs.shape[0]
    vols = proxy_vols[:B]
    side = vols.shape[1]
    factor = fine_size // side

    pos = jnp.einsum("bij,nj->ibn", motion_scale_Rs, p,
                     precision=jax.lax.Precision.HIGHEST) \
        + motion_Ts.T[:, :, None]                             # (3, B, N)
    scale = cnl_bbox_scale_xyz.reshape(3, 1, 1)
    mn = cnl_bbox_min_xyz.reshape(3, 1, 1)
    grid = (pos - mn) * scale - 1.0

    size = jnp.array([fine_size - 1] * 3, pos.dtype).reshape(3, 1, 1)
    f = (grid + 1.0) * 0.5 * size
    fc = f / factor
    # top boundary: fine support extends to f < fine_size while the tent
    # at fc would leak past the last coarse cell — clamp to side-1 (full
    # weight on the last cell, which dominates by pooling+dilation);
    # keep far-OOB samples at exactly 0 via the fine-support gate
    in_support = (fc > -0.5) & (fc < float(side))
    fc = jnp.where(in_support, jnp.minimum(fc, float(side - 1)), -10.0)

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .motion_pallas import trilinear_bone_weights
        ub = trilinear_bone_weights(vols, fc[0], fc[1], fc[2],
                                    compute_dtype=compute_dtype)
    else:
        ub = _flat_trilinear(vols, fc[0], fc[1], fc[2])       # (B, N)
    return jnp.sum(ub, axis=0).reshape(*orig_shape, 1)


def build_obs_proxy(proxy_vols: jnp.ndarray,
                    motion_scale_Rs: jnp.ndarray,
                    motion_Ts: jnp.ndarray,
                    cnl_bbox_min_xyz: jnp.ndarray,
                    cnl_bbox_scale_xyz: jnp.ndarray,
                    obs_min: jnp.ndarray,
                    obs_max: jnp.ndarray,
                    fine_size: int = 32,
                    obs_fine: int = 64,
                    factor: int = 2,
                    compute_dtype=None):
    """OBSERVATION-space ranking proxy volume, built once per frame.

    The per-sample compaction ranking (:func:`sample_motion_proxy`) pays
    B bone-volume lookups per sample because each bone warps the sample
    into its own canonical frame.  At render time every ray chunk of a
    frame shares ONE set of motion transforms, so the B-bone bound can be
    baked into a single observation-space volume: evaluate the canonical
    proxy bound on an ``obs_fine``^3 grid spanning the frame's sample
    bbox, then max-pool by ``factor`` + 1-cell dilate (the
    :func:`pool_dilate_volume` construction).  Per-sample ranking then
    costs ONE volume lookup instead of B (~24x less ranking MXU work;
    the grid evaluation amortizes over every sample of the frame).

    Bound caveat (vs the per-sample proxy, which is a true upper bound at
    every point): the grid only SAMPLES the canonical bound, whose tent
    kinks can peak between obs-grid points, so the baked volume can
    under-estimate by up to one canonical-proxy tent slope step over half
    an obs cell (obs cells are ~4x finer than the 16^3 canonical proxy
    cells at default sizes, and the 3^3 dilation absorbs most of it).
    A miss only re-orders marginal low-mass samples in the ranking —
    the same accepted failure mode as proxy-vs-exact ranking itself
    (see pool_dilate_volume); promotion is gated on a fixed-checkpoint
    eval A/B like every other eval-path knob (docs/ROADMAP.md).

    Returns ``(vol, obs_min, obs_step)``: the (S,S,S) [z,y,x] volume plus
    the mapping for :func:`sample_obs_proxy`.
    """
    idx = jnp.arange(obs_fine, dtype=jnp.float32)
    # degenerate-extent guard (flat bbox in some dim, e.g. tiny tests)
    step = jnp.maximum((obs_max - obs_min) / float(obs_fine - 1), 1e-6)
    # grid points in [z, y, x] volume layout: z slowest, x fastest
    gz, gy, gx = jnp.meshgrid(idx, idx, idx, indexing="ij")
    pts = jnp.stack([obs_min[0] + gx * step[0],
                     obs_min[1] + gy * step[1],
                     obs_min[2] + gz * step[2]], axis=-1)     # (F,F,F,3)
    ub = sample_motion_proxy(pts.reshape(-1, 3), motion_scale_Rs,
                             motion_Ts, proxy_vols, cnl_bbox_min_xyz,
                             cnl_bbox_scale_xyz, fine_size=fine_size,
                             compute_dtype=compute_dtype)
    vol = ub.reshape(obs_fine, obs_fine, obs_fine)
    vol = pool_dilate_volume(vol[None], factor=factor)[0]
    return vol, obs_min, step


def sample_obs_proxy(pts: jnp.ndarray,
                     obs_vol: jnp.ndarray,
                     obs_min: jnp.ndarray,
                     obs_step: jnp.ndarray,
                     factor: int = 2,
                     use_pallas: bool | None = None,
                     compute_dtype=None) -> jnp.ndarray:
    """Rank bound per sample from the baked observation-space volume.

    Same tent-at-coarse-coordinate convention as
    :func:`sample_motion_proxy` (clamped top cell, exact 0 far out of
    support), but ONE volume lookup per sample regardless of bone count.
    """
    orig_shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)
    side = obs_vol.shape[0]
    f = (p - obs_min[None, :]) / obs_step[None, :]            # fine idx
    fc = (f / float(factor)).T                                # (3, N)
    in_support = jnp.all((fc > -0.5) & (fc < float(side)), axis=0)
    fc = jnp.where(in_support[None, :],
                   jnp.minimum(fc, float(side - 1)), -10.0)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from .motion_pallas import trilinear_bone_weights
        ub = trilinear_bone_weights(obs_vol[None], fc[0][None],
                                    fc[1][None], fc[2][None],
                                    compute_dtype=compute_dtype)
    else:
        ub = _flat_trilinear(obs_vol[None], fc[0][None], fc[1][None],
                             fc[2][None])                     # (1, N)
    return ub[0].reshape(*orig_shape, 1)


def sample_motion_fields(pts: jnp.ndarray,
                         motion_scale_Rs: jnp.ndarray,
                         motion_Ts: jnp.ndarray,
                         motion_weights_vol: jnp.ndarray,
                         cnl_bbox_min_xyz: jnp.ndarray,
                         cnl_bbox_scale_xyz: jnp.ndarray,
                         weight_clamp: float = 0.0001,
                         use_pallas: bool | None = None,
                         compute_dtype=None):
    """Inverse-LBS skeletal warp: observation points -> canonical points.

    Behavioral equivalent of `network.py:351-402` (minus its background
    channel): for each bone b, transform ``pos_b = R_b p + T_b``, sample the
    bone's motion-weight channel at the normalized canonical coordinate, and
    return the weight-normalized average of the transformed positions plus
    the weight-sum foreground likelihood.

    Args:
        pts: (..., 3) observation-space sample points.
        motion_scale_Rs: (B, 3, 3) observation->canonical rotations/scales.
        motion_Ts: (B, 3) translations.
        motion_weights_vol: (B+1, D, H, W) softmax weight volume; the last
            channel (background) is ignored, as in the reference
            (`network.py:363`).
        cnl_bbox_min_xyz: (3,) canonical bbox min.
        cnl_bbox_scale_xyz: (3,) = 2 / (max - min).
        compute_dtype: per-call matmul input dtype for the Pallas kernel
            (None = module default).  bfloat16 is for no-grad callers
            only (compaction ranking, eval renders); see motion_pallas.

    Returns:
        (x_skel (..., 3), fg_likelihood_mask (..., 1))
    """
    orig_shape = pts.shape[:-1]
    p = pts.reshape(-1, 3)                                    # (N, 3)
    B = motion_scale_Rs.shape[0]
    weights_vol = motion_weights_vol[:B]                      # drop bg channel
    D, H, W = weights_vol.shape[1:]

    # TPU layout: every large tensor keeps N as the minor (lane) dimension.
    # A (B, N, 3) layout pads the 3-dim to 128 lanes (42x memory blowup and
    # a ~1000x slowdown, measured); (3, B, N) tiles cleanly.
    # HIGHEST precision — positions feed floor()/lerp, so bf16 MXU rounding
    # is not acceptable.
    pos = jnp.einsum("bij,nj->ibn", motion_scale_Rs, p,
                     precision=jax.lax.Precision.HIGHEST) \
        + motion_Ts.T[:, :, None]                             # (3, B, N)
    scale = cnl_bbox_scale_xyz.reshape(3, 1, 1)
    mn = cnl_bbox_min_xyz.reshape(3, 1, 1)
    grid = (pos - mn) * scale - 1.0                           # (3, B, N) xyz

    size = jnp.array([W - 1, H - 1, D - 1], pos.dtype).reshape(3, 1, 1)
    f = (grid + 1.0) * 0.5 * size
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and (D, H, W) == (
            32, 32, 32))
    if use_pallas:
        # XLA lowers this computed-index gather to a ~8.7 ns/element scalar
        # loop on TPU; the Pallas one-hot-matmul kernel is ~40x faster
        from .motion_pallas import trilinear_bone_weights
        weights = trilinear_bone_weights(weights_vol, f[0], f[1], f[2],
                                         compute_dtype=compute_dtype)
    else:
        weights = _flat_trilinear(weights_vol, f[0], f[1], f[2])  # (B, N)
    # saved (not recomputed) under the training remat policy: re-running
    # the sampling kernel in the backward costs ~47 ms/step
    weights = ad_checkpoint.checkpoint_name(weights, "motion_w")

    wsum = jnp.sum(weights, axis=0)                           # (N,)
    x_skel = jnp.einsum("bn,ibn->in", weights, pos) / \
        jnp.clip(wsum, weight_clamp, None)[None, :]           # (3, N)

    return (x_skel.T.reshape(*orig_shape, 3),
            wsum.reshape(*orig_shape, 1))
