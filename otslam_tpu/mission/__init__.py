from otslam_tpu.mission.tracker import ObjectTracker, TrackedCluster  # noqa: F401
from otslam_tpu.mission.visiting import (visiting_points, scan_sites,  # noqa: F401
                                         VisitingPoint)
from otslam_tpu.mission.goal_queue import GoalSender, TargetPoint  # noqa: F401
from otslam_tpu.mission.manager import SystemManager, ManagerState  # noqa: F401
from otslam_tpu.mission.scanner import ScannerNode, ScanObjectGoal  # noqa: F401
from otslam_tpu.mission.goal_list import (  # noqa: F401
    GoalData, default_goal_list, load_goal_list, save_goal_list, as_targets)
from otslam_tpu.mission.removed_check import (  # noqa: F401
    RemovedCheckConfig, CheckPoint, bfs_clusters, nearest_check_point)
