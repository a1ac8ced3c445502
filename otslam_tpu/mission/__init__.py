from otslam_tpu.mission.tracker import ObjectTracker, TrackedCluster  # noqa: F401
from otslam_tpu.mission.visiting import visiting_points, VisitingPoint  # noqa: F401
from otslam_tpu.mission.goal_queue import GoalSender, TargetPoint  # noqa: F401
from otslam_tpu.mission.manager import SystemManager, ManagerState  # noqa: F401
from otslam_tpu.mission.scanner import ScannerNode, ScanObjectGoal  # noqa: F401
