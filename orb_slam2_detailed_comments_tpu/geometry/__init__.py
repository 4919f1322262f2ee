from .so3 import (
    hat, vee, exp_so3, log_so3, quat_to_rotmat, rotmat_to_quat,
)
from .se3 import (
    exp_se3, log_se3, se3_inverse, se3_compose, se3_apply,
    make_se3, se3_identity,
)
from .sim3 import (
    exp_sim3, log_sim3, sim3_inverse, sim3_compose, sim3_apply,
    make_sim3, sim3_identity, sim3_to_se3,
)
from .camera import PinholeCamera
from .triangulate import triangulate_dlt, triangulate_midpoint
