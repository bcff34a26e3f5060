"""On-chip error + speed of the three matmul compute modes per kernel.

Run on the real chip (axon); prints one line per (kernel, mode) with
mean ms and max relative error vs the exact XLA oracle.  Measured
results live in ops/_dtypes.py and docs/ROADMAP.md.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))
import time, numpy as np, jax, jax.numpy as jnp
from occnerf_tpu.ops.vertagg import knn_weighted_agg
from occnerf_tpu.ops.motion_pallas import trilinear_bone_weights
from occnerf_tpu.ops import hashgrid_pallas
from occnerf_tpu.ops.hashgrid import HashGridSpec, hash_grid_encode

def timed(f, *a, n=10):
    o = f(*a); _ = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    t0 = time.time()
    for _i in range(n):
        o = f(*a)
    _ = float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])
    return (time.time()-t0)/n, o

rng = np.random.default_rng(0)

# --- vertagg backward (reference scale) ---
sizes = (6890, 1722, 430, 107); k, C = 10, 36
V = sum(sizes); N = 19200
table = jnp.asarray(rng.normal(size=(V, C)).astype(np.float32))
groups, idx_cols, off = [], [], 0
for s, v in enumerate(sizes):
    groups.append((off, off+v, s*k, (s+1)*k))
    idx_cols.append(rng.integers(off, off+v, (N, k))); off += v
groups = tuple(groups)
idx = jnp.asarray(np.concatenate(idx_cols, 1).astype(np.int32))
atts = jnp.asarray(rng.uniform(size=(N, 4*k)).astype(np.float32))
cot = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
g_ref = np.asarray(jax.jit(jax.grad(lambda t: jnp.sum(
    jnp.einsum("nk,nkc->nc", atts, t[idx]) * cot)))(table))
for mode in ("float32", "tf32", "bfloat16"):
    f = jax.jit(jax.grad(lambda t: jnp.sum(
        knn_weighted_agg(t, idx, atts, groups=groups,
                         compute_dtype=mode) * cot)))
    dt, g = timed(f, table)
    rel = float(np.abs(np.asarray(g)-g_ref).max()/np.abs(g_ref).max())
    print(f"vertagg_bwd  {mode:9s} {dt*1e3:7.2f} ms  rel={rel:.2e}", flush=True)

# --- motion kernel fwd (B=24, N=196608 full-N scale) ---
B, Nm, side = 24, 196608, 32
vols = jnp.asarray(rng.uniform(size=(B, side, side, side)).astype(np.float32))
fx = jnp.asarray(rng.uniform(0, side-1, (B, Nm)).astype(np.float32))
fy = jnp.asarray(rng.uniform(0, side-1, (B, Nm)).astype(np.float32))
fz = jnp.asarray(rng.uniform(0, side-1, (B, Nm)).astype(np.float32))
w_ref = None
for mode in ("float32", "tf32", "bfloat16"):
    f = jax.jit(lambda v, x, y, z, m=mode: trilinear_bone_weights(
        v, x, y, z, compute_dtype=m))
    dt, w = timed(f, vols, fx, fy, fz)
    w = np.asarray(w)
    if w_ref is None: w_ref = w
    rel = float(np.abs(w-w_ref).max()/max(np.abs(w_ref).max(), 1e-9))
    print(f"motion_fwd   {mode:9s} {dt*1e3:7.2f} ms  rel={rel:.2e}", flush=True)

# --- hashgrid encode fwd+bwd (2^14, L=16, N=19200*... use 49152) ---
spec = HashGridSpec.create(input_dim=4, num_levels=16, level_dim=2,
                           base_resolution=16, log2_hashmap_size=14,
                           desired_resolution=2048)
T = jnp.asarray(rng.normal(size=(spec.offsets[-1], 2)).astype(np.float32)*1e-2)
x = jnp.asarray(rng.uniform(0, 1, (49152, 4)).astype(np.float32))
cot2 = jnp.asarray(rng.normal(size=(49152, 32)).astype(np.float32))
g_ref2 = np.asarray(jax.jit(jax.grad(lambda t: jnp.sum(
    hash_grid_encode(x, t, spec) * cot2)))(T))
for mode in ("float32", "tf32", "bfloat16"):
    f = jax.jit(jax.grad(lambda t, m=mode: jnp.sum(
        hashgrid_pallas.hash_grid_encode_tpu(x, t, spec,
                                             compute_dtype=m) * cot2)))
    dt, g = timed(f, T)
    rel = float(np.abs(np.asarray(g)-g_ref2).max()/np.abs(g_ref2).max())
    print(f"hashgrid_f+b {mode:9s} {dt*1e3:7.2f} ms  rel={rel:.2e}", flush=True)
