"""Sim(3) similarity transforms for loop closing / essential-graph optimization.

Replaces g2o::Sim3 (reference: Thirdparty/g2o/g2o/types/sim3.h) with batched
jit-safe ops. A Sim3 S = (s, R, t) acts as x' = s R x + t. Stored as a
(..., 4, 4) matrix whose rotation block is s*R (same encoding the reference
uses when converting to cv::Mat), plus helpers that separate s and R.
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import exp_so3, log_so3, hat
from .se3 import make_se3

_EPS = 1e-8


def sim3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def make_sim3(R, t, s):
    """(..., 3, 3), (..., 3), (...,) -> (..., 4, 4) with top-left s*R."""
    return make_se3(s[..., None, None] * R, t)


def sim3_scale(S):
    """Recover scale as det(sR)^(1/3)."""
    sR = S[..., :3, :3]
    return jnp.cbrt(jnp.linalg.det(sR))


def sim3_rotation(S):
    s = sim3_scale(S)
    return S[..., :3, :3] / s[..., None, None]


def sim3_translation(S):
    return S[..., :3, 3]


def sim3_inverse(S):
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    t = S[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -(s_inv[..., None] * (Rt @ t[..., None])[..., 0])
    return make_sim3(Rt, t_inv, s_inv)


def sim3_compose(A, B):
    return A @ B


def sim3_apply(S, p):
    """(..., 4, 4) x (..., N, 3) -> (..., N, 3): x' = s R x + t."""
    sR = S[..., :3, :3]
    t = S[..., :3, 3]
    return p @ jnp.swapaxes(sR, -1, -2) + t[..., None, :]


def sim3_to_se3(S):
    """Drop scale: [sR | t] -> [R | t/s], the reference's essential-graph
    SE3 recovery (reference: src/Optimizer.cc:1297-1311 — translation is
    divided by scale when converting the optimized Sim3 back to SE3)."""
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    t = S[..., :3, 3] / s[..., None]
    return make_se3(R, t)


def exp_sim3(xi):
    """Sim(3) exponential. xi = (..., 7) = (rho, phi, sigma):
    rho translation-ish (3), phi rotation (3), sigma log-scale (1).
    """
    rho = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6]
    s = jnp.exp(sigma)
    R = exp_so3(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # Coefficients of V = a*I + b*W + c*W^2 for sim3 (Strasdat thesis eq. appendix)
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta_sq < 1e-8

    a_s0 = jnp.where(small_theta, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)  # placeholder path
    # Case sigma ~ 0:
    c0_A = jnp.where(small_theta, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS))
    c0_B = jnp.where(small_theta, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS))
    V0 = eye + c0_A[..., None, None] * W + c0_B[..., None, None] * W2

    # General sigma:
    sig = jnp.where(small_sigma, 1.0, sigma)  # avoid 0-division; branch-selected later
    es = jnp.exp(sig)
    A_g = (es - 1.0) / sig
    # theta general, sigma general:
    a_gen = es * jnp.sin(theta)
    b_gen = es * jnp.cos(theta)
    denom = sig * sig + theta_sq
    B_g = jnp.where(
        small_theta,
        ((sig - 1.0) * es + 1.0) / jnp.maximum(sig * sig, _EPS),
        (a_gen * sig + (1.0 - b_gen) * theta) / jnp.maximum(theta * denom, _EPS),
    )
    C_g = jnp.where(
        small_theta,
        ((0.5 * sig * sig - sig + 1.0) * es - 1.0) / jnp.maximum(sig * sig * sig, _EPS),
        (A_g - ((b_gen - 1.0) * sig + a_gen * theta) / jnp.maximum(denom, _EPS)) / jnp.maximum(theta_sq, _EPS),
    )
    Vg = A_g[..., None, None] * eye + B_g[..., None, None] * W + C_g[..., None, None] * W2

    V = jnp.where(small_sigma[..., None, None], V0, Vg)
    t = (V @ rho[..., None])[..., 0]
    del a_s0
    return make_sim3(R, t, s)


def log_sim3(S):
    """Inverse of exp_sim3 via numerically-stable closed forms."""
    s = sim3_scale(S)
    R = S[..., :3, :3] / s[..., None, None]
    t = S[..., :3, 3]
    sigma = jnp.log(s)
    phi = log_so3(R)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS * _EPS))
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), W.shape)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta_sq < 1e-8

    c0_A = jnp.where(small_theta, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, _EPS))
    c0_B = jnp.where(small_theta, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta_sq * theta, _EPS))
    V0 = eye + c0_A[..., None, None] * W + c0_B[..., None, None] * W2

    sig = jnp.where(small_sigma, 1.0, sigma)
    es = jnp.exp(sig)
    A_g = (es - 1.0) / sig
    a_gen = es * jnp.sin(theta)
    b_gen = es * jnp.cos(theta)
    denom = sig * sig + theta_sq
    B_g = jnp.where(
        small_theta,
        ((sig - 1.0) * es + 1.0) / jnp.maximum(sig * sig, _EPS),
        (a_gen * sig + (1.0 - b_gen) * theta) / jnp.maximum(theta * denom, _EPS),
    )
    C_g = jnp.where(
        small_theta,
        ((0.5 * sig * sig - sig + 1.0) * es - 1.0) / jnp.maximum(sig * sig * sig, _EPS),
        (A_g - ((b_gen - 1.0) * sig + a_gen * theta) / jnp.maximum(denom, _EPS)) / jnp.maximum(theta_sq, _EPS),
    )
    Vg = A_g[..., None, None] * eye + B_g[..., None, None] * W + C_g[..., None, None] * W2
    V = jnp.where(small_sigma[..., None, None], V0, Vg)

    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
