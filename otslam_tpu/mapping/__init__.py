from otslam_tpu.mapping.virtual_scan import VirtualScanner  # noqa: F401
from otslam_tpu.mapping.change_detect import ChangeDetector  # noqa: F401
from otslam_tpu.mapping.merge import smart_paste, selective_merge  # noqa: F401
from otslam_tpu.mapping.hybrid import (  # noqa: F401
    map_to_cloud,
    build_hybrid_map,
    save_hybrid_map,
)
