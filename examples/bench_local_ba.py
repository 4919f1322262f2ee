"""Micro-benchmark for local BA buckets + scatter-vs-matmul accumulation.

Run on the real TPU (no args) or CPU (ORB_FORCE_CPU=1). Builds a synthetic
max-bucket local-BA problem (C=64 cams, P=16k points, E=48k edges with a
realistic degree distribution) and times:
  1. local_bundle_adjustment (the production path)
  2. the raw scatter-add accumulation pattern in isolation
  3. the same accumulation as one-hot matmuls / grouped reductions
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("ORB_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

import orb_slam2_detailed_comments_tpu  # noqa: F401  (sets matmul precision)
from orb_slam2_detailed_comments_tpu.optim.local_ba import (
    BAProblem, local_bundle_adjustment)
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera


def make_problem(C=64, P=16384, E=49152, seed=0):
    rng = np.random.default_rng(seed)
    # cameras on an arc looking at a cloud
    cam_Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    for i in range(C):
        ang = 0.02 * i
        ca, sa = np.cos(ang), np.sin(ang)
        cam_Tcw[i, :3, :3] = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        cam_Tcw[i, :3, 3] = [0.1 * i, 0.0, 0.0]
    pts = rng.uniform([-5, -5, 4], [5, 5, 12], (P, 3)).astype(np.float32)

    # realistic degree distribution: mostly 2-4 observers, a long tail
    deg = np.clip(rng.geometric(0.35, P) + 1, 2, 16)
    e_cam, e_pt = [], []
    for p in range(P):
        base = rng.integers(0, C - 1)
        cams = np.unique(np.clip(base + np.arange(deg[p]), 0, C - 1))
        for c in cams:
            e_cam.append(c)
            e_pt.append(p)
            if len(e_cam) >= E:
                break
        if len(e_cam) >= E:
            break
    e_cam = np.asarray(e_cam, np.int32)
    e_pt = np.asarray(e_pt, np.int32)
    n = len(e_cam)
    pad = E - n
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    Tc = cam_Tcw[e_cam]
    pc = np.einsum("eij,ej->ei", Tc[:, :3, :3], pts[e_pt]) + Tc[:, :3, 3]
    u = fx * pc[:, 0] / pc[:, 2] + cx + rng.normal(0, 0.5, n)
    v = fy * pc[:, 1] / pc[:, 2] + cy + rng.normal(0, 0.5, n)
    obs = np.stack([u, v, -np.ones(n)], -1).astype(np.float32)

    prob = BAProblem(
        cam_Tcw=jnp.asarray(cam_Tcw),
        cam_free=jnp.asarray(np.arange(C) >= 2),
        cam_valid=jnp.ones(C, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.05, (P, 3)).astype(np.float32)),
        point_valid=jnp.ones(P, bool),
        edge_cam=jnp.asarray(np.pad(e_cam, (0, pad))),
        edge_point=jnp.asarray(np.pad(e_pt, (0, pad))),
        edge_obs=jnp.asarray(np.pad(obs, ((0, pad), (0, 0)))),
        edge_octave=jnp.zeros(E, jnp.int32),
        edge_valid=jnp.asarray(np.pad(np.ones(n, bool), (0, pad))),
    )
    return prob


def chain_time(step, state0, iters=8):
    """Serialized-dependency-chain timing (the axon tunnel's
    block_until_ready can return early; see CLAUDE.md). `step` maps
    state -> state; one final HOST TRANSFER ends the chain."""
    state = step(state0)           # compile
    np.asarray(jax.tree.leaves(state)[0]).ravel()[0]
    state = state0
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    np.asarray(jax.tree.leaves(state)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters


def loop_time(op_step, state0, inner=50, reps=3):
    """Time one op by running `inner` chained iterations INSIDE a single
    jitted dispatch (tunnel dispatch overhead ~5-8 ms would otherwise
    swamp sub-ms ops). Returns seconds per op iteration."""
    import jax.lax as lax

    @jax.jit
    def run(state):
        return lax.fori_loop(0, inner, lambda i, s: op_step(s), state)

    state = run(state0)
    np.asarray(jax.tree.leaves(state)[0]).ravel()[0]
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = run(state0)
        np.asarray(jax.tree.leaves(state)[0]).ravel()[0]
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    C, P, E = 64, 16384, 49152
    prob = make_problem(C, P, E)
    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    inv_s2 = jnp.ones(8, jnp.float32)

    # chain-overhead baseline: trivial step on the same state pytree
    @jax.jit
    def null_step(state):
        c, p = state
        return c + 1e-9, p + 1e-9

    t = chain_time(null_step, (prob.cam_Tcw, prob.points))
    print(f"null step (chain/dispatch overhead):            {t*1e3:.2f} ms")

    def ba_step(state):
        c, p = state
        nc, np_, _ = local_bundle_adjustment(
            prob._replace(cam_Tcw=c, points=p), cam, inv_s2)
        return nc, np_

    t = chain_time(ba_step, (prob.cam_Tcw, prob.points), iters=4)
    print(f"local_bundle_adjustment max bucket: {t*1e3:.1f} ms")

    # isolate: scatter-add accumulation of (E,3,3) blocks into (P,3,3);
    # each step's output feeds the next via a gather so the chain serializes
    key = jax.random.PRNGKey(0)
    blocks = jax.random.normal(key, (E, 3, 3), jnp.float32)
    idx = prob.edge_point

    def fb(x, out):
        # scalar-sum feedback: serializes the chain without a gather
        return x + 1e-12 * jnp.sum(out)

    def scat(blocks):
        return fb(blocks, jnp.zeros((P, 3, 3)).at[idx].add(blocks))

    t = loop_time(scat, blocks)
    print(f"scatter-add (E={E})->(P,3,3):       {t*1e3:.2f} ms")

    def scatA(blocks6):
        return fb(blocks6, jnp.zeros((P, C, 6, 3)).at[prob.edge_point, prob.edge_cam].add(blocks6))

    blocks6 = jax.random.normal(key, (E, 6, 3), jnp.float32)
    t = loop_time(scatA, blocks6, inner=20)
    print(f"scatter-add (E)->(P,C,6,3):         {t*1e3:.2f} ms")

    # alternative: camera one-hot matmul for (C,6,6)-style accumulations
    def onehot_cam(blocks):
        oh = (prob.edge_cam[None, :] == jnp.arange(C)[:, None]).astype(jnp.float32)
        return fb(blocks, (oh @ blocks.reshape(E, 9)).reshape(C, 3, 3))

    t = loop_time(onehot_cam, blocks)
    print(f"one-hot matmul (E)->(C,3,3):        {t*1e3:.2f} ms")

    # alternative: sorted-segment reduction via cumsum for (P,3,3)
    def segsum(blocks):
        flat = blocks.reshape(E, 9)
        cs = jnp.concatenate([jnp.zeros((1, 9)), jnp.cumsum(flat, 0)], 0)
        start = jnp.searchsorted(idx, jnp.arange(P))
        end = jnp.searchsorted(idx, jnp.arange(P), side="right")
        return fb(blocks, (cs[end] - cs[start]).reshape(P, 3, 3))

    t = loop_time(segsum, blocks)
    print(f"cumsum segment-sum (E)->(P,3,3):    {t*1e3:.2f} ms")

    # grouped layout: (P, K) reduction (the scatter-free candidate)
    K = 8
    gb = jax.random.normal(key, (P, K, 3, 3), jnp.float32)

    def grouped(gb):
        return fb(gb, jnp.sum(gb, axis=1))

    t = loop_time(grouped, gb)
    print(f"grouped (P,K={K}) reduce -> (P,3,3):   {t*1e3:.2f} ms")

    # row gathers as used by _edge_terms: points[edge_point], cams[edge_cam]
    pts = jax.random.normal(key, (P, 3), jnp.float32)

    def gath_p(pts):
        return fb(pts, pts[prob.edge_point])

    t = loop_time(gath_p, pts)
    print(f"row gather (P,3)[E]:                {t*1e3:.2f} ms")

    cams44 = jax.random.normal(key, (C, 4, 4), jnp.float32)

    def gath_c(cams44):
        return fb(cams44, cams44[prob.edge_cam])

    t = loop_time(gath_c, cams44)
    print(f"row gather (C,4,4)[E]:              {t*1e3:.2f} ms")

    # one-hot alternative for the (C,4,4)[E] gather
    def gath_c_oh(cams44):
        oh = (prob.edge_cam[:, None] == jnp.arange(C)[None, :]).astype(jnp.float32)
        return fb(cams44, (oh @ cams44.reshape(C, 16)).reshape(E, 4, 4))

    t = loop_time(gath_c_oh, cams44)
    print(f"one-hot gather (C,4,4)[E]:          {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
