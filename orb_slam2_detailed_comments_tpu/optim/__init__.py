from .pose_gn import pose_optimization
from .local_ba import local_bundle_adjustment, BAProblem
