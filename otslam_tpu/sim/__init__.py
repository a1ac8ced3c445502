from otslam_tpu.sim.world import Box, Cylinder, Cone, Scene  # noqa: F401
from otslam_tpu.sim.sensors import (  # noqa: F401
    render_depth,
    render_rgbd,
    render_lidar,
    look_at_pose,
)
