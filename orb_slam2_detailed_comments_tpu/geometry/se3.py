"""SE(3) rigid transforms as (..., 4, 4) homogeneous matrices.

Replaces g2o::SE3Quat (reference: Thirdparty/g2o/g2o/types/se3quat.h) with
batched, jit-safe matrix transforms. Convention follows the reference:
Tcw maps world points to camera coordinates, x_c = R_cw x_w + t_cw.
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import (exp_so3, log_so3, left_jacobian_so3, left_jacobian_inv_so3,
                  quat_to_rotmat, rotmat_to_quat)


def se3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def make_se3(R, t):
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_rotation(T):
    return T[..., :3, :3]


def se3_translation(T):
    return T[..., :3, 3]


def se3_inverse(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_se3(Rt, -(Rt @ t[..., None])[..., 0])


def se3_compose(A, B):
    return A @ B


def se3_apply(T, p):
    """Apply transform to points: (..., 4, 4) x (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return p @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def se3_renormalize(T):
    """Project the rotation block back onto SO(3) via a quaternion
    round-trip (the float32 equivalent of g2o's SE3Quat normalization).

    Composing raw 4x4 matrices (velocity = Tcw_cur inv(Tcw_last), pose
    prediction, repeated GN left-updates) amplifies any orthonormality
    error multiplicatively — left unchecked it grows exponentially
    (~2.4x/frame measured) until the 'rotation' carries percent-level
    scale/shear that reprojection optimizers happily fit. Call this at
    every optimizer boundary."""
    R = quat_to_rotmat(rotmat_to_quat(T[..., :3, :3]))
    return make_se3(R, T[..., :3, 3])


def exp_se3(xi):
    """Twist (..., 6) = (rho, phi) [translation-ish first, rotation last] -> (..., 4, 4).

    Matches the g2o convention used by the reference's BA vertices where the
    update is exp([omega, upsilon]) — here we take xi = (upsilon, omega):
    xi[..., :3] translation part, xi[..., 3:] rotation part.
    """
    rho = xi[..., :3]
    phi = xi[..., 3:]
    R = exp_so3(phi)
    J = left_jacobian_so3(phi)
    t = (J @ rho[..., None])[..., 0]
    return make_se3(R, t)


def log_se3(T):
    """(..., 4, 4) -> twist (..., 6) = (upsilon, omega)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    phi = log_so3(R)
    Jinv = left_jacobian_inv_so3(phi)
    rho = (Jinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)
