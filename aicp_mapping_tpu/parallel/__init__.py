from .mesh import initialize_distributed, make_mesh, make_mesh_2d  # noqa: F401
from .posegraph import (  # noqa: F401
    PoseGraph,
    make_odometry_edges,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
    pad_edges,
)
from .sharded_icp import (histogram_quantile,  # noqa: F401
                          map_sharded_point_to_plane_icp,
                          sharded_point_to_plane_icp)
from .ba import (  # noqa: F401
    PlaneBA,
    build_plane_ba,
    extract_planes,
    optimize_plane_ba,
    optimize_plane_ba_sharded,
    pad_observations,
)
from .localizer import ShardedMapLocalizer, morton_argsort_np  # noqa: F401
