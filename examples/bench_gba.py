#!/usr/bin/env python
"""Single-device global-BA benchmark: flat edge-list PCG vs grouped
scatter-free PCG at the KITTI-00-10-batch scale (see bench_scaling.py).

Usage: python examples/bench_gba.py [--cams 1408] [--points 60000]
       [--obs-per-cam 256] [--iters 2] [--cg 30] [--skip-flat]
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
    ap.add_argument("--obs-per-cam", type=int, default=256)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--cg", type=int, default=30)
    ap.add_argument("--skip-flat", action="store_true")
    ap.add_argument("--skip-dense", action="store_true")
    args = ap.parse_args()

    if os.environ.get("ORB_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from bench_scaling import build_problem
    from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
    from orb_slam2_detailed_comments_tpu.optim.global_ba import global_bundle_adjustment
    from orb_slam2_detailed_comments_tpu.optim.global_ba_grouped import (
        group_global_problem, _solve_grouped)

    cam = PinholeCamera(fx=718.0, fy=718.0, cx=607.0, cy=185.0)
    inv_s2 = jnp.asarray([1.0 / 1.2 ** (2 * i) for i in range(8)], jnp.float32)
    prob = build_problem(args.cams, args.points, args.obs_per_cam, as_numpy=True)
    E = int(prob.edge_cam.shape[0])
    print(f"# {args.cams} cams, {args.points} pts, {E} edges, "
          f"{args.iters} GN x {args.cg} CG", file=sys.stderr)

    def timed(name, fn):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"solver": name,
                          "ms_per_gn_iter": round(dt * 1e3, 1)}))
        return dt

    t0 = time.perf_counter()
    gp = group_global_problem(prob, inv_s2)
    print(f"# grouping (host): {1e3*(time.perf_counter()-t0):.0f} ms, "
          f"Kp={gp.g_cam.shape[0]} Sp={gp.sp_cam.shape[0]} "
          f"Kc={gp.c_sel.shape[0]} Sc={gp.cs_sel.shape[0]}", file=sys.stderr)

    timed("grouped-gemm-k1", lambda: _solve_grouped(
        gp, cam, args.iters, args.cg, 1e-5, "gemm", 1))
    if not args.skip_dense:
        timed("grouped-dense", lambda: _solve_grouped(
            gp, cam, args.iters, args.cg, 1e-5, "dense", 1))
    if not args.skip_flat:
        timed("flat", lambda: global_bundle_adjustment(
            prob, cam, inv_s2, n_iters=args.iters, cg_iters=args.cg))
    if os.environ.get("BENCH_GATHER"):
        timed("grouped-gather", lambda: _solve_grouped(
            gp, cam, args.iters, args.cg, 1e-5, "gather", 1))
    if os.environ.get("BENCH_K2"):
        timed("grouped-gemm-k2", lambda: _solve_grouped(
            gp, cam, args.iters, args.cg, 1e-5, "gemm", 2))


if __name__ == "__main__":
    main()
