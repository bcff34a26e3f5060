from .hashgrid import HashGridSpec, hash_grid_encode  # noqa: F401
from .knn import knn, multiscale_knn  # noqa: F401
from .raymarch import raw2outputs, sample_zvals, stratify_zvals  # noqa: F401
from .sh import sh_encode  # noqa: F401
from .trilinear import grid_sample_3d, sample_motion_fields  # noqa: F401
