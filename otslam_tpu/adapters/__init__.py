from otslam_tpu.adapters.native import (  # noqa: F401
    load_native,
    native_available,
    FrameRing,
)
