"""Multi-host (multi-process) runtime for distributed bundle adjustment.

The reference is a single process; its only concurrency is pthreads over
shared memory (reference: System.cc:133-152). This module is the
beyond-reference scaling tier required by BASELINE.json's north star:
global BA sharded over EVERY device of a multi-host deployment, with the
Schur-complement reductions riding XLA collectives — ICI within a slice,
DCN (or TCP on CPU hosts) between hosts. JAX's runtime makes the two cases
the same program: `jax.distributed.initialize` + a mesh over
`jax.devices()` (which spans all processes) and the existing
`shard_map`-based solver.

Usage (one call per process, before any other JAX API):

    from orb_slam2_detailed_comments_tpu.parallel import multihost
    multihost.initialize(coordinator="10.0.0.1:9876",
                         num_processes=4, process_id=rank)
    mesh = multihost.global_ba_mesh()
    cams, pts = distributed_global_ba(prob, cam, inv_s2, mesh, ...)

On TPU pods, `initialize()` with no arguments uses the TPU cluster
environment. On CPU hosts (tests, CI), pass `cpu_devices_per_process` to
emulate a pod topology; collectives run over Gloo TCP.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu_devices_per_process: Optional[int] = None) -> None:
    """Initialize the multi-process JAX runtime for this process.

    Must run before any other JAX call. With no arguments, defers to
    cluster auto-detection (TPU pod environments). For CPU emulation or
    explicit clusters, pass coordinator ("host:port"), num_processes and
    this process's process_id.
    """
    import jax

    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
        # cross-process CPU collectives ride Gloo TCP (the DCN stand-in)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_ba_mesh(axis: str = "edge"):
    """1-D mesh over every device of every process.

    jax.devices() spans the whole cluster after initialize(); the BA
    shards therefore split across hosts, and the psum reductions become
    cross-host collectives. axis="edge" feeds the flat edge-sharded
    solver (parallel/distributed_ba.py); axis="pt" feeds the grouped
    point-sharded solver (parallel/distributed_ba_grouped.py).
    """
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def make_global_array(x, mesh, spec):
    """Build a process-spanning jax.Array from host-replicated data.

    Every process holds the full value `x` (the SLAM map state is small
    relative to its observation set); each process contributes exactly the
    shards the sharding assigns to its local devices.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    x = jnp.asarray(x)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
