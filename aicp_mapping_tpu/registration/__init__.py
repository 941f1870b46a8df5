from .icp import (  # noqa: F401
    ICPConfig,
    ICPResult,
    clamp_trim_ratio,
    degeneracy_predictions,
    point_to_plane_icp,
)
from .chain import (  # noqa: F401
    ChainFilterConfig,
    apply_chain_filters,
)
from .monitor import hausdorff_distance, residual_stats  # noqa: F401
