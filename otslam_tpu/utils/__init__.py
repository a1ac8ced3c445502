from otslam_tpu.utils.probes import (  # noqa: F401
    depth_stats,
    depth_heat_image,
    trajectory_frames,
)
from otslam_tpu.utils.profiling import StageTimer  # noqa: F401
