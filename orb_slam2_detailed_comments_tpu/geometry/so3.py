"""SO(3) rotations: batched, jit-safe Lie group operations.

TPU-native replacement for the reference's Eigen/g2o quaternion + rotation
utilities (reference: Thirdparty/g2o/g2o/types/se3quat.h, src/Converter.cc:40-212).
All functions broadcast over leading batch dimensions and are numerically
safe at theta -> 0 via Taylor-series branches selected with jnp.where.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_cos_coeffs(theta_sq):
    """Return (A, B, C) = (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3), safe at 0."""
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-8
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / theta_sq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (theta_sq * theta))
    return a, b, c


def exp_so3(w):
    """Rodrigues: rotation vector (..., 3) -> rotation matrix (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    a, b, _ = _sinc_cos_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R):
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Uses the quaternion route for stability near pi.
    """
    q = rotmat_to_quat(R)  # (w, x, y, z), w >= 0
    qw = q[..., 0]
    qv = q[..., 1:]
    nv = jnp.linalg.norm(qv, axis=-1)
    # angle = 2*atan2(|qv|, qw); axis = qv/|qv|
    angle = 2.0 * jnp.arctan2(nv, qw)
    scale = jnp.where(nv < _EPS, 2.0 / jnp.maximum(qw, _EPS), angle / jnp.maximum(nv, _EPS))
    return scale[..., None] * qv


def quat_to_rotmat(q):
    """Unit quaternion (..., 4) in (w, x, y, z) order -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R):
    """(..., 3, 3) -> unit quaternion (..., 4) (w, x, y, z), w >= 0.

    Branch-free Shepperd method: compute all four candidate constructions
    and select the best-conditioned via jnp.where (jit/vmap friendly).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    # four candidates: based on trace, m00, m11, m22 dominant
    qw0 = safe_sqrt(1.0 + tr) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0 + _EPS), (m02 - m20) / (4 * qw0 + _EPS), (m10 - m01) / (4 * qw0 + _EPS)], axis=-1)
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1 + _EPS), qx1, (m01 + m10) / (4 * qx1 + _EPS), (m02 + m20) / (4 * qx1 + _EPS)], axis=-1)
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2 + _EPS), (m01 + m10) / (4 * qy2 + _EPS), qy2, (m12 + m21) / (4 * qy2 + _EPS)], axis=-1)
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3 + _EPS), (m02 + m20) / (4 * qz3 + _EPS), (m12 + m21) / (4 * qz3 + _EPS), qz3], axis=-1)

    # pick the candidate with the largest pivot
    pivots = jnp.stack([qw0, qx1, qy2, qz3], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def left_jacobian_so3(w):
    """Left Jacobian J_l of SO(3): used by se3/sim3 exp translation part."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, b, c = _sinc_cos_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def left_jacobian_inv_so3(w):
    """Inverse left Jacobian of SO(3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    small = theta_sq < 1e-8
    half = theta / 2.0
    cot_coeff = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta_sq, _EPS * _EPS),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_coeff[..., None, None] * W2
