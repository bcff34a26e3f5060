from .hashgrid import (HashGridSpec, hash_grid_encode,  # noqa: F401
                       hash_grid_encode_sorted, grad_total_variation)
from .knn import knn, multiscale_knn  # noqa: F401
from .raymarch import raw2outputs, sample_zvals, stratify_zvals  # noqa: F401
from .sh import sh_encode  # noqa: F401
from .trilinear import grid_sample_3d, sample_motion_fields  # noqa: F401


def set_compute_dtype(dtype) -> None:
    """Set the Pallas kernels' default matmul compute mode — the mode the
    DIFFERENTIABLE train pass runs at (per-call rank/eval overrides sit
    on top).  Accepted: 'float32' (exact, 6 MXU passes), 'tfloat32'/
    'tf32' (bf16x3, ~1e-6 relative, ~2x the f32 rate), 'bfloat16'
    (single pass, ~2e-3 relative, fastest).  See ops/_dtypes.py.
    Must run BEFORE the first jit trace of the kernels."""
    from . import hashgrid_pallas, motion_pallas, vertagg
    from ._dtypes import dt_key
    key = dt_key(str(dtype))
    hashgrid_pallas.COMPUTE_DTYPE = key
    motion_pallas.COMPUTE_DTYPE = key
    vertagg.COMPUTE_DTYPE = key


def set_xla_matmul_precision(name: str) -> None:
    """Set the precision of XLA-side (non-Pallas) dots — the canonical
    MLP stacks, KNN distance matmuls, LPIPS convs, einsum aggregations.
    On TPU these otherwise run JAX's DEFAULT schedule: ONE bf16 MXU pass
    with f32 accumulation (the standard mixed-precision training idiom;
    every shipped quality gate ran and passed under it).  'tensorfloat32'
    = bf16x3 (~1e-6 relative), 'float32' = exact (~6 passes).  Applies
    process-globally via jax_default_matmul_precision; set before (or
    it will retrigger) jit traces."""
    import jax
    key = {"default": "default", "bfloat16": "default", "bf16": "default",
           "tensorfloat32": "tensorfloat32", "tf32": "tensorfloat32",
           "tfloat32": "tensorfloat32", "high": "tensorfloat32",
           "float32": "float32", "f32": "float32",
           "highest": "float32"}.get(str(name))
    if key is None:
        raise ValueError(f"unknown xla matmul precision {name!r}")
    jax.config.update("jax_default_matmul_precision", key)


def set_knn_recall(recall: float) -> None:
    """Set the approx-KNN recall target (default 0.95; 0.85 is ~30%
    faster with negligible downstream effect).  Set before jit tracing."""
    from . import knn as _knn
    _knn.APPROX_RECALL = float(recall)


# backend for the hot per-sample hash-grid encode (cfg.tpu.hashgrid_backend):
#   'auto'   — MXU one-hot Pallas kernel when the spec fits (tables
#              <= 2^15), else the sorted scatter-free backward; the XLA
#              AD path off-TPU
#   'pallas' — force the MXU kernel (errors if the spec is unsupported)
#   'sorted' — force the sort/segmented-scan backward
#   'xla'    — plain XLA gather with AD scatter backward (oracle path)
HASHGRID_BACKEND = "auto"


def set_hashgrid_backend(name: str) -> None:
    """Select the per-sample hash-grid encode backend (see above).
    Must run BEFORE the first jit trace of the model."""
    global HASHGRID_BACKEND
    name = str(name)
    if name not in ("auto", "pallas", "sorted", "xla"):
        raise ValueError(f"unknown hashgrid backend {name!r}")
    HASHGRID_BACKEND = name


# backend for the KNN vertex-feature aggregation (cfg.tpu.vertagg_backend):
#   'auto'   — attention-weighted one-hot MXU matmul kernel on TPU
#              (V-block tiled + per-scale group factorized, any table
#              size); the gather+einsum XLA path otherwise
#   'pallas' — force the kernel (errors if unsupported)
#   'xla'    — force gather+einsum (scatter-add backward; oracle path)
VERTAGG_BACKEND = "auto"


def set_vertagg_backend(name: str) -> None:
    """Select the vertex-aggregation backend (see above).  Must run
    BEFORE the first jit trace of the model."""
    global VERTAGG_BACKEND
    name = str(name)
    if name not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown vertagg backend {name!r}")
    VERTAGG_BACKEND = name
