"""occnerf_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of OccNeRF.

Rendering humans from object-occluded monocular videos (ICCV 2023), rebuilt
from scratch for TPU: pure-function models over parameter pytrees, a single
jitted train step sharded over a ``jax.sharding.Mesh``, and Pallas/XLA
kernels replacing the reference's CUDA extensions (hash-grid encoder,
multiscale KNN, ray compositing).

Reference behavioral spec: https://github.com/tiangexiang/OccNeRF
(mounted read-only at /root/reference; cited as ``path:line`` in docstrings).
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from . import registry  # noqa: F401
