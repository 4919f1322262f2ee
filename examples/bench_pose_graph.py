"""Benchmark the essential-graph optimizer at KITTI-00 keyframe counts.

The dense backend materializes a (7K, 7K) Hessian per GN iteration and
Cholesky-factors it — fine after keyframe culling at loop-test scales,
pathological at KITTI-00 keyframe counts (~1400 KFs -> 9856^2 factor,
x20 iterations). The CG backend never materializes H (matrix-free PCG,
one-hot GEMM expand/reduce). This script measures both where feasible.

Run on TPU:      python examples/bench_pose_graph.py
Run on CPU mesh: ORB_FORCE_CPU=1 python examples/bench_pose_graph.py
"""
from __future__ import annotations

import os
import sys
import time

if os.environ.get("ORB_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_detailed_comments_tpu.optim.pose_graph import (
    PoseGraphProblem, optimize_pose_graph)


def circle_problem(Kn, seed=7, drift=0.01, covis_every=4):
    """Pure-numpy problem construction: per-element jnp calls here would
    be thousands of ~10-100 ms dispatches through the axon tunnel (the
    round-2 version of this harness spent 15+ minutes building the
    K=1408 problem before the solver ever ran)."""
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(Kn) / Kn

    def yrot(a):
        c, s = np.cos(a), np.sin(a)
        R = np.zeros((np.shape(a)[0], 3, 3), np.float64)
        R[:, 0, 0] = c; R[:, 0, 2] = s
        R[:, 1, 1] = 1.0
        R[:, 2, 0] = -s; R[:, 2, 2] = c
        return R

    R_all = yrot(ang)
    C_all = 50.0 * np.stack([np.sin(ang), np.zeros(Kn), 1 - np.cos(ang)], -1)
    S_true = np.tile(np.eye(4), (Kn, 1, 1))
    S_true[:, :3, :3] = R_all
    S_true[:, :3, 3] = -np.einsum("kij,kj->ki", R_all, C_all)
    S_true = S_true.astype(np.float32)

    S_true_inv = np.linalg.inv(S_true.astype(np.float64))

    def rel(i, j):
        return (S_true[j].astype(np.float64) @ S_true_inv[i]).astype(np.float32)

    def small_sim3(xi):
        """exp_sim3 for small tangents via numpy (first-order-exact is
        not enough for measurement consistency; use scipy-free closed
        form: rotation by Rodrigues, scale exp, V approx via series)."""
        rho, phi, sigma = xi[:3], xi[3:6], xi[6]
        th = np.linalg.norm(phi)
        Wm = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]],
                       [-phi[1], phi[0], 0]])
        if th < 1e-8:
            R = np.eye(3) + Wm
        else:
            R = np.eye(3) + np.sin(th) / th * Wm \
                + (1 - np.cos(th)) / th ** 2 * (Wm @ Wm)
        s = np.exp(sigma)
        # V for sim3 with small sigma/theta: series to 2nd order suffices
        # for drift-scale noise (|xi| ~ 1e-2)
        V = np.eye(3) + 0.5 * (Wm + sigma * np.eye(3))
        S = np.eye(4)
        S[:3, :3] = s * R
        S[:3, 3] = V @ rho
        return S.astype(np.float32)

    S_est = [S_true[0]]
    for i in range(1, Kn):
        noise = small_sim3(np.concatenate(
            [rng.normal(0, drift, 6), [rng.normal(0, drift / 2)]]))
        S_est.append((noise @ rel(i - 1, i) @ S_est[i - 1]).astype(np.float32))
    S_est = np.stack(S_est)

    e_i, e_j, e_S = [], [], []
    for i in range(Kn - 1):
        e_i.append(i); e_j.append(i + 1); e_S.append(rel(i, i + 1))
    e_i.append(Kn - 1); e_j.append(0); e_S.append(rel(Kn - 1, 0))
    for i in range(0, Kn - covis_every, covis_every):
        e_i.append(i); e_j.append(i + covis_every); e_S.append(rel(i, i + covis_every))
    E = len(e_i)
    prob = PoseGraphProblem(
        S_init=jnp.asarray(S_est),
        vertex_fixed=jnp.asarray([True] + [False] * (Kn - 1)),
        vertex_valid=jnp.ones(Kn, bool),
        edge_i=jnp.asarray(e_i, jnp.int32),
        edge_j=jnp.asarray(e_j, jnp.int32),
        edge_Sji=jnp.asarray(np.stack(e_S)),
        edge_valid=jnp.ones(E, bool),
        edge_weight=jnp.ones(E),
    )
    return prob, S_true, S_est


def run(Kn, backend, n_iters=10):
    prob, S_true, S_est = circle_problem(Kn)
    E = int(prob.edge_i.shape[0])
    # warm-up / compile
    S = optimize_pose_graph(prob, n_iters=1, backend=backend)
    S.block_until_ready()
    t0 = time.perf_counter()
    S = optimize_pose_graph(prob, n_iters=n_iters, backend=backend)
    S.block_until_ready()
    dt = time.perf_counter() - t0
    # compile cost of the n_iters variant is amortized out by re-running
    t0 = time.perf_counter()
    S = optimize_pose_graph(prob, n_iters=n_iters, backend=backend)
    S.block_until_ready()
    dt = time.perf_counter() - t0

    t_opt = np.asarray(S)[:, :3, 3]
    t_true = S_true[:, :3, 3]
    t_est = S_est[:, :3, 3]
    err0 = np.linalg.norm(t_est - t_true, axis=1).mean()
    err1 = np.linalg.norm(t_opt - t_true, axis=1).mean()
    print(f"K={Kn:5d} E={E:5d} backend={backend:5s} "
          f"{dt / n_iters * 1e3:8.1f} ms/GN-iter   "
          f"mean |t| err {err0:.3f} -> {err1:.4f} m "
          f"({100.0 * err1 / err0:.2f}% of init)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for Kn, backend in [(256, "dense"), (256, "cg"), (704, "cg"),
                        (704, "banded"), (1408, "cg"), (1408, "banded")]:
        run(Kn, backend, n_iters=20 if backend == "banded" else 10)
