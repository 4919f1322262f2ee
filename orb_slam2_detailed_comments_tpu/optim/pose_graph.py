"""Essential-graph Sim3 pose-graph optimization (loop correction).

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(reference: src/Optimizer.cc:1050-1381): 7-DoF Sim3 vertices per keyframe,
relative-Sim3 edges over four classes — new loop connections, spanning-tree
edges, past loop edges, strong covisibility (weight >= 100) — solved with
Gauss-Newton. Per-edge 7x14 Jacobians come from forward-mode autodiff of
the Sim3 log-composition error (the reference hand-copies g2o's numeric
Jacobians); the normal system is accumulated by scatter-add into a dense
(7K, 7K) matrix and solved with Cholesky. K is the number of keyframes in
the graph (static cap chosen by the caller), well within dense range after
keyframe culling.

Edge error (g2o EdgeSim3 convention): e = log(Sji . Si . Sj^-1) where Si,
Sj are world->keyframe Sim3 and Sji the measured relative transform.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.sim3 import exp_sim3, log_sim3, sim3_inverse


class PoseGraphProblem(NamedTuple):
    S_init: jnp.ndarray      # (K, 4, 4) initial world->KF Sim3 (sR | t)
    vertex_fixed: jnp.ndarray  # (K,) bool (loop KF + origin fixed)
    vertex_valid: jnp.ndarray  # (K,) bool
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_Sji: jnp.ndarray    # (E, 4, 4) measured relative Sim3
    edge_valid: jnp.ndarray  # (E,) bool
    edge_weight: jnp.ndarray  # (E,) float32


def _edge_error(xi_i, xi_j, Si, Sj, Sji):
    """7-vector error for one edge with tangent perturbations."""
    Si_new = exp_sim3(xi_i) @ Si
    Sj_new = exp_sim3(xi_j) @ Sj
    return log_sim3(Sji @ Si_new @ sim3_inverse(Sj_new))


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        damping: float = 1e-8):
    """Run GN on the pose graph; returns optimized (K, 4, 4) Sim3 poses."""
    K = prob.S_init.shape[0]
    zero7 = jnp.zeros(7)

    err_fn = jax.vmap(_edge_error, in_axes=(None, None, 0, 0, 0))
    Ji_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=0), in_axes=(None, None, 0, 0, 0))
    Jj_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=1), in_axes=(None, None, 0, 0, 0))

    free = (prob.vertex_valid & ~prob.vertex_fixed)
    free7 = jnp.repeat(free, 7)

    def body(_, S):
        Si = S[prob.edge_i]
        Sj = S[prob.edge_j]
        r = err_fn(zero7, zero7, Si, Sj, prob.edge_Sji)       # (E, 7)
        Ji = Ji_fn(zero7, zero7, Si, Sj, prob.edge_Sji)       # (E, 7, 7)
        Jj = Jj_fn(zero7, zero7, Si, Sj, prob.edge_Sji)
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)

        Hii = jnp.einsum("eri,erj,e->eij", Ji, Ji, w)
        Hjj = jnp.einsum("eri,erj,e->eij", Jj, Jj, w)
        Hij = jnp.einsum("eri,erj,e->eij", Ji, Jj, w)
        bi = jnp.einsum("eri,er,e->ei", Ji, r, w)
        bj = jnp.einsum("eri,er,e->ei", Jj, r, w)

        H = jnp.zeros((K, 7, K, 7))
        H = H.at[prob.edge_i, :, prob.edge_i, :].add(Hii)
        H = H.at[prob.edge_j, :, prob.edge_j, :].add(Hjj)
        H = H.at[prob.edge_i, :, prob.edge_j, :].add(Hij)
        H = H.at[prob.edge_j, :, prob.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7)).at[prob.edge_i].add(bi).at[prob.edge_j].add(bj)

        Hd = H.reshape(K * 7, K * 7)
        bd = b.reshape(K * 7)
        Hd = jnp.where(free7[:, None] & free7[None, :], Hd, 0.0)
        Hd = Hd + jnp.diag(jnp.where(free7, damping, 1.0))
        Hd = Hd + damping * jnp.trace(Hd) / (K * 7) * jnp.eye(K * 7)
        bd = jnp.where(free7, bd, 0.0)

        L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
        dx = -jax.scipy.linalg.cho_solve((L, low), bd).reshape(K, 7)
        dx = jnp.where(free[:, None], dx, 0.0)
        return jax.vmap(lambda d, s: exp_sim3(d) @ s)(dx, S)

    return jax.lax.fori_loop(0, n_iters, body, prob.S_init)
