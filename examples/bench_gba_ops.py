#!/usr/bin/env python
"""Micro-benchmark of camera-side reduction/expansion strategies for the
grouped global BA at KITTI-00-10-batch scale (C=1408, P=60000, Kp~8-20).

Per CG matvec the Schur solver needs:
  expand:  xe[k,p] = x[g_cam[k,p]]        (C,6) table -> (Kp,P) per col
  reduce:  out[c] = sum over edges of cam c of val[edge]   -> (C,) per col

Candidates:
  gather      : xm[i][g_cam]                       (current grouped code)
  take-perm   : take(store, c_sel) + sum over Kc   (current grouped code)
  onehot-f32  : (C, Kp*P) one-hot built INSIDE the jit, GEMM both ways
  onehot-bf16 : same, bf16 one-hot + bf16 values (f32 accumulate)
  scatter     : zeros.at[e_cam].add(...)           (flat solver style)

Each candidate is its own jitted program; progress lines go to stderr so a
timeout kill still leaves the completed rows. Timing: N dispatches in a
serialized dependency chain, one final block (see CLAUDE.md: per-op
block_until_ready through the axon tunnel lies). NOTE: building the 2.7 GB
one-hot EAGERLY (op-by-op through the axon tunnel) hung >9 min on v5e;
inside a jit it is fused into the consumer GEMM.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=1408)
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--kp", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip", default="", help="comma list of substrings")
    args = ap.parse_args()
    skips = [s for s in args.skip.split(",") if s]

    if os.environ.get("ORB_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    C, P, Kp = args.cams, args.points, args.kp
    E = Kp * P
    rng = np.random.default_rng(0)
    g_cam_host = rng.integers(0, C, (Kp, P)).astype(np.int32)
    g_cam = jnp.asarray(g_cam_host)
    vals6 = jnp.asarray(rng.normal(0, 1, (6, Kp, P)).astype(np.float32))
    x6 = jnp.asarray(rng.normal(0, 1, (C, 6)).astype(np.float32))

    # camera-major permutation (sorted by camera, Kc slots per camera).
    # NEVER np.asarray a device array here: the first device->host pull in
    # a process takes 2-6 minutes through the axon tunnel (CLAUDE.md).
    flat_cam = g_cam_host.reshape(-1)
    order = np.argsort(flat_cam, kind="stable")
    deg = np.bincount(flat_cam, minlength=C)
    Kc = int(deg.max())
    start = np.zeros(C, np.int64)
    start[1:] = np.cumsum(deg)[:-1]
    k = np.arange(Kc)
    idx = np.minimum(start[:, None] + k[None, :], E - 1)
    cval = k[None, :] < deg[:, None]
    c_sel = jnp.asarray(np.where(cval, order[idx], 0).astype(np.int32).T)
    c_valid = jnp.asarray(cval.T)
    e_cam_flat = g_cam.reshape(-1)

    jax.block_until_ready((g_cam, vals6, x6, c_sel, c_valid))
    print("# setup done", file=sys.stderr, flush=True)

    def onehot(dtype):
        # built inside the consuming jit; XLA fuses it into the GEMM
        return (e_cam_flat[None, :] == jnp.arange(C)[:, None]).astype(dtype)

    def timed(name, step, x0):
        if any(s in name for s in skips):
            return
        print(f"# compiling {name}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        f = jax.jit(step)
        x = f(x0)
        jax.block_until_ready(x)
        print(f"# compiled {name} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        x = x0
        for _ in range(args.reps):
            x = f(x)
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / args.reps
        print(json.dumps({"op": name, "ms": round(dt * 1e3, 2)}), flush=True)

    # ---- reduction: (6, Kp, P) -> (C, 6) ----
    v0 = vals6
    timed("reduce/take-perm", lambda v: v + 1e-9 * jnp.sum(
        (jnp.take(v.reshape(6, E), c_sel.reshape(-1), axis=1)
         .reshape(6, Kc, C) * c_valid[None]).sum(axis=1) * x6.T), v0)
    timed("reduce/scatter", lambda v: v + 1e-9 * jnp.sum(
        jnp.zeros((C, 6)).at[e_cam_flat].add(v.reshape(6, E).T) * x6), v0)
    timed("ptreduce/sum", lambda v: v + 1e-9 * jnp.sum(
        v.sum(axis=1) * vals6[:, 0]), v0)
    timed("reduce/onehot-f32", lambda v: v + 1e-9 * jnp.sum(
        (v.reshape(6, E) @ onehot(jnp.float32).T) * x6.T), v0)
    timed("reduce/onehot-bf16", lambda v: v + 1e-9 * jnp.sum(
        jax.lax.dot_general(
            v.reshape(6, E).astype(jnp.bfloat16), onehot(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * x6.T), v0)

    # ---- expansion: (C,6) -> (6, Kp, P); weight by vals6 so nothing DCEs.
    # gather LAST: its compile has hung Mosaic/XLA on this toolchain ----
    timed("expand/onehot-f32", lambda x: x + 1e-9 * jnp.sum(
        (x.T @ onehot(jnp.float32)).reshape(6, Kp, P) * vals6), x6)
    timed("expand/onehot-bf16", lambda x: x + 1e-9 * jnp.sum(
        jax.lax.dot_general(
            x.T.astype(jnp.bfloat16), onehot(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(6, Kp, P) * vals6), x6)
    timed("expand/gather", lambda x: x + 1e-9 * sum(
        jnp.sum(x[:, i][g_cam] * vals6[i]) for i in range(6)), x6)


if __name__ == "__main__":
    main()
