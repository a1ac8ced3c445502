from otslam_tpu.kernels.backproject import (  # noqa: F401
    filter_depth,
    backproject_depth,
    backproject_pointcloud,
)
from otslam_tpu.kernels.voxel import voxel_downsample  # noqa: F401
from otslam_tpu.kernels.tsdf import (  # noqa: F401
    TSDFVolume,
    make_volume,
    integrate_frame,
    integrate_frames,
    partial_integrate,
    merge_partials,
    extract_surface_points,
)
