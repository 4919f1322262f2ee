"""Batched two-view triangulation.

Replaces the reference's per-point SVD triangulation
(reference: src/Initializer.cc Triangulate; src/LocalMapping.cc:516-530)
with a batched DLT solve that XLA maps onto the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(P1, P2, uv1, uv2):
    """DLT triangulation.

    Args:
      P1, P2: (3, 4) or (..., 3, 4) projection matrices (K [R|t]).
      uv1, uv2: (..., 2) pixel observations in each view.

    Returns:
      (..., 3) world points (homogeneous-normalized).

    The reference builds the 4x4 system A x = 0 and takes the smallest
    singular vector (Initializer.cc "Triangulate"). We solve the same
    system batched: rows are u*P[2]-P[0], v*P[2]-P[1] for each view.
    Instead of a batched SVD (slow on TPU) we solve the equivalent
    normal-equations eigenproblem of the 4x4 matrix A^T A with
    jnp.linalg.eigh, which is batched and small.
    """
    P1 = jnp.broadcast_to(P1, uv1.shape[:-1] + (3, 4))
    P2 = jnp.broadcast_to(P2, uv2.shape[:-1] + (3, 4))
    rows = [
        uv1[..., 0:1] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1:2] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0:1] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1:2] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (..., 4, 4)
    # row-normalize for conditioning
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    AtA = jnp.swapaxes(A, -1, -2) @ A
    _, vecs = jnp.linalg.eigh(AtA)
    x = vecs[..., :, 0]  # smallest eigenvalue's eigenvector
    w = x[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w[..., None]


def triangulate_dlt_np(P1, P2, uv1, uv2):
    """Host (numpy) twin of triangulate_dlt for bookkeeping call sites with
    DATA-DEPENDENT batch sizes (local mapping's per-neighbor epipolar
    candidate counts). Eager jnp here would recompile ~15 tiny TPU programs
    per unique N and dispatch each through the device tunnel — measured as
    a per-keyframe compile storm in the round-5 e2e bench. The math is a
    few hundred 4x4 eigendecompositions; numpy does it in microseconds."""
    import numpy as np
    P1 = np.broadcast_to(P1, uv1.shape[:-1] + (3, 4))
    P2 = np.broadcast_to(P2, uv2.shape[:-1] + (3, 4))
    rows = [
        uv1[..., 0:1] * P1[..., 2, :] - P1[..., 0, :],
        uv1[..., 1:2] * P1[..., 2, :] - P1[..., 1, :],
        uv2[..., 0:1] * P2[..., 2, :] - P2[..., 0, :],
        uv2[..., 1:2] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = np.stack(rows, axis=-2).astype(np.float32)
    A = A / (np.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)
    AtA = np.swapaxes(A, -1, -2) @ A
    _, vecs = np.linalg.eigh(AtA)
    x = vecs[..., :, 0]
    w = x[..., 3]
    w = np.where(np.abs(w) < 1e-12, 1e-12, w)
    return x[..., :3] / w[..., None]


def triangulate_midpoint(c1, r1, c2, r2):
    """Midpoint triangulation from camera centers c and unit rays r (..., 3)."""
    # Solve [r1 -r2][a;b] = c2 - c1 in least squares, then midpoint.
    r12 = jnp.sum(r1 * r2, axis=-1)
    d = c2 - c1
    d1 = jnp.sum(d * r1, axis=-1)
    d2 = jnp.sum(d * r2, axis=-1)
    denom = 1.0 - r12 * r12
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    a = (d1 - r12 * d2) / denom
    b = (r12 * d1 - d2) / denom
    p1 = c1 + a[..., None] * r1
    p2 = c2 + b[..., None] * r2
    return 0.5 * (p1 + p2)
