#!/usr/bin/env python
"""Distributed global-BA scaling-efficiency benchmark.

Builds a KITTI-00-10-batch-scale synthetic global BA problem (the
north-star multi-host config in BASELINE.json: all 11 odometry sequences'
keyframe graphs adjusted jointly) and times the edge-sharded Schur-PCG
solver over growing device meshes, reporting scaling efficiency
t(1) / (n * t(n)) per device count.

Usage:
  python examples/bench_scaling.py [--cams 1408] [--points 60000]
        [--obs-per-cam 256] [--iters 4] [--cg 30] [--devices 1,2,4,8]

On a TPU pod slice, run under multi-host init (see parallel/multihost.py)
and the mesh spans hosts; on one chip it reports the n=1 row. On CPU it
validates the harness with virtual devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 ORB_FORCE_CPU=1).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_problem(n_cams, n_points, obs_per_cam, seed=0, as_numpy=False):
    """as_numpy=True keeps all arrays host-side (BAProblem fields accept
    numpy; jit converts on entry). Essential when the TPU is reached via
    the axon tunnel: pulling a built-on-device problem back to the host
    for grouping costs ~60 s in transfers."""
    import jax.numpy as jnp
    from orb_slam2_detailed_comments_tpu.optim.local_ba import BAProblem
    if as_numpy:
        jnp = np

    rng = np.random.default_rng(seed)
    # cameras on a long noisy trajectory (KITTI-like forward motion)
    cams = np.tile(np.eye(4, dtype=np.float32), (n_cams, 1, 1))
    cams[:, 0, 3] = -np.cumsum(rng.uniform(0.5, 1.5, n_cams)).astype(np.float32)
    pts = rng.uniform([-50, -10, 5], [50, 10, 80], (n_points, 3)).astype(np.float32)

    E = n_cams * obs_per_cam
    e_cam = np.repeat(np.arange(n_cams, dtype=np.int32), obs_per_cam)
    e_pt = rng.integers(0, n_points, E).astype(np.int32)
    fx = fy = 718.0
    cx, cy = 607.0, 185.0
    pc = np.einsum("eij,ej->ei", cams[e_cam, :3, :3], pts[e_pt]) + cams[e_cam, :3, 3]
    pc[:, 2] = np.abs(pc[:, 2]) + 1.0
    u = fx * pc[:, 0] / pc[:, 2] + cx + rng.normal(0, 0.5, E)
    v = fy * pc[:, 1] / pc[:, 2] + cy + rng.normal(0, 0.5, E)
    e_obs = np.stack([u, v, np.full(E, -1.0)], -1).astype(np.float32)

    prob = BAProblem(
        cam_Tcw=jnp.asarray(cams),
        cam_free=jnp.asarray(np.asarray([False, False] + [True] * (n_cams - 2))),
        cam_valid=jnp.ones(n_cams, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(n_points, bool),
        edge_cam=jnp.asarray(e_cam),
        edge_point=jnp.asarray(e_pt),
        edge_obs=jnp.asarray(e_obs),
        edge_octave=jnp.zeros(E, np.int32),
        edge_valid=jnp.ones(E, bool),
    )
    return prob


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=1408)       # 11 seqs x 128 KFs
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--obs-per-cam", type=int, default=256)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cg", type=int, default=30)
    ap.add_argument("--devices", type=str, default="")
    ap.add_argument("--solver", choices=("grouped", "flat"), default="grouped",
                    help="grouped = point-sharded one-hot-GEMM/dense solver "
                         "(production); flat = edge-sharded scatter PCG")
    ap.add_argument("--analytic", action="store_true",
                    help="report per-device FLOPs from XLA cost analysis "
                         "instead of wall clock. Wall clock on a VIRTUAL "
                         "device mesh (CPU) is NOT a scaling signal — all "
                         "virtual devices share the same physical cores, so "
                         "t(n) ~= t(1) by construction. Per-device FLOPs "
                         "shrinking ~1/n plus the (analytically known) "
                         "collective volume IS measurable anywhere.")
    args = ap.parse_args()

    if os.environ.get("ORB_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from jax.sharding import Mesh
    from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
    if args.solver == "grouped":
        from orb_slam2_detailed_comments_tpu.parallel.distributed_ba_grouped \
            import distributed_global_ba_grouped as distributed_global_ba
    else:
        from orb_slam2_detailed_comments_tpu.parallel.distributed_ba import (
            distributed_global_ba,
        )

    all_dev = jax.devices()
    if args.devices:
        try:
            counts = [int(x) for x in args.devices.split(",")]
        except ValueError:
            raise SystemExit(
                f"--devices must be comma-separated ints, got {args.devices!r}")
        bad = [n for n in counts if n < 1 or n > len(all_dev)]
        if bad:
            raise SystemExit(
                f"--devices {bad} out of range: {len(all_dev)} device(s) visible")
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_dev)]

    cam = PinholeCamera(fx=718.0, fy=718.0, cx=607.0, cy=185.0)
    import jax.numpy as jnp
    inv_s2 = jnp.asarray([1.0 / 1.2 ** (2 * i) for i in range(8)], jnp.float32)
    # grouped solver preprocesses on the host: keep the problem host-side
    # (avoids the catastrophic first device->host pull through the tunnel)
    prob = build_problem(args.cams, args.points, args.obs_per_cam,
                         as_numpy=(args.solver == "grouped"))
    E = int(prob.edge_cam.shape[0])
    print(f"# problem: {args.cams} cams, {args.points} points, {E} edges",
          file=sys.stderr)

    if args.analytic:
        if args.solver != "grouped":
            raise SystemExit("--analytic supports the grouped solver only")
        from orb_slam2_detailed_comments_tpu.optim.global_ba_grouped import (
            DENSE_MAX_CAMS)
        C = args.cams
        backend = "dense" if C <= DENSE_MAX_CAMS else "gemm"
        rows = []
        f1 = None
        for n in counts:
            mesh = Mesh(np.asarray(all_dev[:n]), ("pt",))
            ca = distributed_global_ba(prob, cam, inv_s2, mesh,
                                       n_iters=args.iters, cg_iters=args.cg,
                                       analyze=True)
            gflop = ca["flops"] / args.iters / 1e9
            if f1 is None:
                f1 = gflop
            # collective f32 volume per GN step, from the solver structure:
            # assembly psum (27+6 cols of C) + [dense: S (6C)^2 + corr 6C |
            # cg: one (6,C) psum per matvec + rhs corr]
            if backend == "dense":
                coll = (33 * C + 36 * C * C + 6 * C) * 4
            else:
                coll = (33 * C + 6 * C + args.cg * 6 * C) * 4
            rows.append({
                "devices": n, "gflop_per_device_per_gn": round(gflop, 2),
                "parallel_fraction": round(f1 / (n * gflop), 3),
                "collective_mb_per_gn": round(coll / 1e6, 2),
                "backend": backend})
            print(json.dumps(rows[-1]))
        print(json.dumps({
            "metric": "distributed_gba_flops_scaling",
            "value": rows[-1]["parallel_fraction"],
            "unit": "flops(1)/(n*flops(n))_at_max_devices",
            "devices": rows[-1]["devices"],
            "rows": rows,
        }))
        return

    results = []
    t1 = None
    axis = "pt" if args.solver == "grouped" else "edge"
    for n in counts:
        mesh = Mesh(np.asarray(all_dev[:n]), (axis,))
        run = lambda: distributed_global_ba(
            prob, cam, inv_s2, mesh, n_iters=args.iters, cg_iters=args.cg)
        cams_out, _ = run()          # compile + warmup
        jax.block_until_ready(cams_out)
        t0 = time.perf_counter()
        cams_out, pts_out = run()
        jax.block_until_ready((cams_out, pts_out))
        dt = (time.perf_counter() - t0) / args.iters
        if t1 is None:
            t1 = dt
        eff = t1 / (n * dt)
        results.append({"devices": n, "ms_per_gn_iter": round(dt * 1e3, 2),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))

    print(json.dumps({
        "metric": "distributed_gba_scaling",
        "value": results[-1]["scaling_efficiency"],
        "unit": "efficiency_at_max_devices",
        "devices": results[-1]["devices"],
        "rows": results,
    }))


if __name__ == "__main__":
    main()
