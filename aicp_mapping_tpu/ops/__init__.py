from .knn import knn, nn_argmin, nn_argmin_pallas, nn_argmin_xla  # noqa: F401
from .normals import estimate_normals  # noqa: F401
from .quantile import masked_mean, masked_median, masked_quantile  # noqa: F401
from .voxel import (  # noqa: F401
    crop_box,
    unique_voxel_count,
    voxel_downsample,
    voxel_keys,
    voxel_set_overlap,
)
from .normals import normals_from_neighbors  # noqa: F401
