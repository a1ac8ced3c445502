from otslam_tpu.pipeline.dataset import (  # noqa: F401
    CaptureDataset,
    FrameBatch,
    get_unique_object_names,
)
from otslam_tpu.pipeline.reconstruct import (  # noqa: F401
    reconstruct_object,
    reconstruct_all,
    reconstruct_range,
)
from otslam_tpu.pipeline.online import OnlineFusion  # noqa: F401
from otslam_tpu.pipeline.refine import (  # noqa: F401
    detect_loop_closures,
    refine_trajectory,
    refine_trajectory_f2m,
    refine_trajectory_pgo,
    trajectory_error,
)
