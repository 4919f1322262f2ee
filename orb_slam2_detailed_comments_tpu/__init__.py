"""TPU-native visual SLAM engine (capabilities of ORB-SLAM2, built from scratch).

A brand-new JAX/XLA/Pallas design — not a port of the C++ reference at
/root/reference. The pointer-graph + threads + mutex architecture of the
reference becomes fixed-capacity array state updated by pure jitted
transforms, with batched kernels for the hot loops (ORB extraction,
Hamming matching, pose-only GN, Schur-complement bundle adjustment) and
jax.sharding meshes for distributed global BA.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):
  geometry/  - SO3/SE3/Sim3 Lie groups, pinhole cameras, triangulation
  ops/       - batched vision kernels: pyramid, FAST, rBRIEF, Hamming,
               projection-guided matching, stereo SAD refine
  state/     - fixed-capacity struct-of-array map model (frames,
               keyframes, map points, covisibility graph)
  optim/     - pose-only GN, local BA (Schur), global BA, Sim3, pose graph
  solvers/   - RANSAC solvers: two-view init (H/F), EPnP, Horn Sim3
  place/     - binary bag-of-words vocabulary + keyframe database
  frontend/  - tracking state machine (per-frame)
  backend/   - local mapping + loop closing stages
  parallel/  - device-mesh sharded distributed bundle adjustment
  io/        - dataset loaders (TUM/KITTI/EuRoC), settings, trajectories
  evaluation/- ATE / RPE metrics
  system.py  - top-level System API (reference: System.h:70-160)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry / bundle-adjustment solves need true f32 matmuls; on TPU the
# default is bf16-input MXU passes which is not enough for SE3/SVD work.
# Hot kernels that can tolerate lower precision request it explicitly via
# the `precision=` argument at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")
