from otslam_tpu.core.camera import PinholeIntrinsics  # noqa: F401
from otslam_tpu.core.se3 import (  # noqa: F401
    T_FIX_OPTICAL,
    T_FIX_GT,
    quat_to_matrix,
    yaw_to_matrix2d,
    matrix_to_yaw,
    invert_se3,
    transform_points,
    euler_xyz_to_matrix,
)
from otslam_tpu.core.pointcloud import PointCloud  # noqa: F401
from otslam_tpu.core.grid import OccupancyGrid2D  # noqa: F401
from otslam_tpu.core.mesh_io import (  # noqa: F401
    TriMesh,
    load_mesh,
    read_obj,
    read_stl,
    read_dae,
    sample_mesh_surface,
)
