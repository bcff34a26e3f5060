"""Multi-chip parallelism: device mesh + sharding layout.

The reference's entire distributed story is single-process
``nn.DataParallel`` over local GPUs, scattering the ray/sample batch and
replicating three submodules (SURVEY.md §2.2).  The TPU-native equivalent
is a 1-D ``jax.sharding.Mesh`` over the chips: parameters and per-frame
pose/volume metadata are replicated, the flattened ray axis is sharded
over ICI, and the only cross-chip communication XLA needs to insert is the
all-gather of per-shard ray outputs for the patch loss plus a psum for the
visibility-counter scatter and scalar losses.  Written mesh-agnostic so a
multi-host DCN data axis falls out of the same annotations.
"""

from .mesh import (RAY_SHARDED_KEYS, batch_shardings, make_mesh,
                   replicated, shard_batch)

__all__ = ["make_mesh", "batch_shardings", "shard_batch", "replicated",
           "RAY_SHARDED_KEYS"]
