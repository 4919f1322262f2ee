"""Worker process for the multi-host distributed-BA test.

Each process owns 4 virtual CPU devices; collectives between the two
processes run over Gloo TCP — the CPU stand-in for cross-host DCN.
Usage: python multihost_worker.py <rank> <nproc> <port> <out.npz> [solver]
solver: "flat" (edge-sharded PCG, default) or "grouped" (point-sharded
one-hot-GEMM — the production multi-device GBA path).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orb_slam2_detailed_comments_tpu.parallel import multihost  # noqa: E402


def main():
    rank, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    solver = sys.argv[5] if len(sys.argv) > 5 else "flat"
    multihost.initialize(coordinator=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=rank,
                         cpu_devices_per_process=4)

    import jax
    import numpy as np
    from orb_slam2_detailed_comments_tpu.parallel.distributed_ba import (
        distributed_global_ba,
    )
    from test_local_ba import build_synthetic_ba, CAM, INV_SIGMA2

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    # identical seeded problem in every process (host-replicated input)
    prob, cams_true, pts_true = build_synthetic_ba(seed=7, noise_px=0.0)
    mesh = multihost.global_ba_mesh("pt" if solver == "grouped" else "edge")
    if solver == "grouped":
        from orb_slam2_detailed_comments_tpu.parallel.distributed_ba_grouped \
            import distributed_global_ba_grouped
        cams, pts = distributed_global_ba_grouped(
            prob, CAM, INV_SIGMA2, mesh, n_iters=10, cg_iters=50)
    else:
        cams, pts = distributed_global_ba(prob, CAM, INV_SIGMA2, mesh,
                                          n_iters=10, cg_iters=50)
    if rank == 0:
        np.savez(out, cams=np.asarray(cams), pts=np.asarray(pts))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
