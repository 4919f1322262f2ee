"""Distributed global bundle adjustment over a jax.sharding device mesh.

The reference has no distributed runtime at all — its "parallelism" is
three pthreads over shared memory (reference: System.cc:133-152; SURVEY.md
section 2.3). This module is the TPU-native scaling path required by
BASELINE.json: observations (edges) are sharded across the mesh, each
device linearizes its edge shard, and the small dense states (camera blocks,
point blocks, gradients) are combined with jax.lax.psum over ICI. The PCG
Schur matvec runs edge-parallel per device with one psum per matvec — a
classic data-parallel Gauss-Newton where XLA inserts the collectives.

Sharding layout:
  edge_* arrays    : sharded on axis 'edge' (leading dim)
  cam_*, points    : replicated
  per-iter reduces : psum(Hcc), psum(Hpp), psum(g_c), psum(g_p)
  per-matvec       : psum(A^T x), psum(u)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..geometry.se3 import exp_se3
from ..optim.local_ba import BAProblem, _edge_terms, _inv3x3
from ..optim.robust import CHI2_MONO, CHI2_STEREO, DELTA_MONO, DELTA_STEREO, huber_weight

AXIS = "edge"


def make_ba_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def _local_linearize(cam_Tcw, points, edge_cam, edge_point, edge_obs,
                     edge_octave, edge_valid, cam_params, inv_sigma2_levels,
                     use_kernel):
    """Per-shard linearization; returns partial (Hcc, Hpp, g_c, g_p) and the
    local per-edge coupling Y."""
    C = cam_Tcw.shape[0]
    Pn = points.shape[0]

    class _Prob:  # adapter matching _edge_terms' field accesses
        pass
    prob = _Prob()
    prob.edge_cam = edge_cam
    prob.edge_point = edge_point
    prob.edge_obs = edge_obs

    r, J_cam, J_pt, behind = _edge_terms(cam_Tcw, points, prob, cam_params)
    is_stereo = edge_obs[:, 2] >= 0.0
    row_mask = jnp.stack([jnp.ones_like(is_stereo, jnp.float32),
                          jnp.ones_like(is_stereo, jnp.float32),
                          is_stereo.astype(jnp.float32)], axis=-1)
    inv_s2 = inv_sigma2_levels[edge_octave]
    rw = r * row_mask
    chi2 = jnp.sum(rw * rw, axis=-1) * inv_s2
    delta = jnp.where(is_stereo, DELTA_STEREO, DELTA_MONO)
    w = jnp.where(use_kernel, huber_weight(chi2, delta), 1.0)
    ok = edge_valid & ~behind
    w = jnp.where(ok, w * inv_s2, 0.0)

    Jc = J_cam * row_mask[:, :, None]
    Jp = J_pt * row_mask[:, :, None]
    Hcc = jnp.zeros((C, 6, 6)).at[edge_cam].add(jnp.einsum("eri,erj,e->eij", Jc, Jc, w))
    Hpp = jnp.zeros((Pn, 3, 3)).at[edge_point].add(jnp.einsum("eri,erj,e->eij", Jp, Jp, w))
    g_c = jnp.zeros((C, 6)).at[edge_cam].add(jnp.einsum("eri,er,e->ei", Jc, rw, w))
    g_p = jnp.zeros((Pn, 3)).at[edge_point].add(jnp.einsum("eri,er,e->ei", Jp, rw, w))
    Y = jnp.einsum("eri,erj,e->eij", Jc, Jp, w)
    return Hcc, Hpp, g_c, g_p, Y


def _sharded_iteration(cam_Tcw, points, cam_free, point_valid,
                       edge_cam, edge_point, edge_obs, edge_octave, edge_valid,
                       inv_sigma2_levels, use_kernel,
                       cam_params, damping, cg_iters):
    """One GN step; runs inside shard_map (edge_* are per-device shards)."""
    C = cam_Tcw.shape[0]
    Pn = points.shape[0]
    Hcc, Hpp, g_c, g_p, Y = _local_linearize(
        cam_Tcw, points, edge_cam, edge_point, edge_obs, edge_octave,
        edge_valid, cam_params, inv_sigma2_levels, use_kernel)
    # combine partial reductions across the mesh (ICI collectives)
    Hcc = jax.lax.psum(Hcc, AXIS)
    Hpp = jax.lax.psum(Hpp, AXIS)
    g_c = jax.lax.psum(g_c, AXIS)
    g_p = jax.lax.psum(g_p, AXIS)

    eye3 = jnp.eye(3)
    eye6 = jnp.eye(6)
    Hpp_d = Hpp + damping * (jnp.einsum("pii->p", Hpp)[:, None, None] / 3.0 + 1e-6) * eye3
    Hcc_d = Hcc + damping * (jnp.einsum("cii->c", Hcc)[:, None, None] / 6.0 + 1e-6) * eye6
    Hpp_inv = _inv3x3(Hpp_d)
    free = cam_free.astype(jnp.float32)

    def matvec(x):
        x = x * free[:, None]
        u = jnp.einsum("cij,cj->ci", Hcc_d, x)
        xe = x[edge_cam]
        v = jnp.zeros((Pn, 3)).at[edge_point].add(jnp.einsum("eij,ei->ej", Y, xe))
        v = jax.lax.psum(v, AXIS)
        wv = jnp.einsum("pij,pj->pi", Hpp_inv, v)
        du = jnp.zeros((C, 6)).at[edge_cam].add(-jnp.einsum("eij,ej->ei", Y, wv[edge_point]))
        du = jax.lax.psum(du, AXIS)
        return (u + du) * free[:, None]

    hg = jnp.einsum("pij,pj->pi", Hpp_inv, g_p)
    corr = jnp.zeros((C, 6)).at[edge_cam].add(jnp.einsum("eij,ej->ei", Y, hg[edge_point]))
    corr = jax.lax.psum(corr, AXIS)
    rhs = -(g_c - corr) * free[:, None]
    Minv = jnp.linalg.inv(Hcc_d + (1.0 - free)[:, None, None] * jnp.eye(6))

    # PCG (replicated math on replicated values; edge work is sharded)
    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = jnp.einsum("cij,cj->ci", Minv, r0)

    def cg_body(_, st):
        x, r, z, p, rz = st
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("cij,cj->ci", Minv, r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
        return x, r, z, z + beta * p, rz_new

    dc = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, z0, jnp.sum(r0 * z0)))[0]

    atdc = jnp.zeros((Pn, 3)).at[edge_point].add(jnp.einsum("eij,ei->ej", Y, dc[edge_cam]))
    atdc = jax.lax.psum(atdc, AXIS)
    dp = -jnp.einsum("pij,pj->pi", Hpp_inv, g_p + atdc)

    dc = dc * free[:, None]
    cam_new = jax.vmap(lambda d, Tc: exp_se3(d) @ Tc)(dc, cam_Tcw)
    dp = jnp.where(point_valid[:, None], dp, 0.0)
    return cam_new, points + dp


def distributed_global_ba(prob: BAProblem, cam, inv_sigma2_levels, mesh: Mesh,
                          n_iters: int = 10, cg_iters: int = 40,
                          damping: float = 1e-5):
    """Run sharded global BA. Edge arrays are padded to a multiple of the
    mesh size and partitioned; returns (cam_Tcw, points)."""
    n_dev = mesh.devices.size
    E = prob.edge_cam.shape[0]
    pad = (-E) % n_dev

    def pad_e(x, fill=0):
        if pad == 0:
            return x
        pad_width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    edge_cam = pad_e(prob.edge_cam)
    edge_point = pad_e(prob.edge_point)
    edge_obs = pad_e(prob.edge_obs)
    edge_octave = pad_e(prob.edge_octave)
    edge_valid = pad_e(prob.edge_valid, fill=False)

    cam_params = (cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    free_mask = prob.cam_free & prob.cam_valid

    repl = P()
    shard = P(AXIS)

    cam_Tcw = prob.cam_Tcw
    points = prob.points
    point_valid = prob.point_valid
    inv_s2 = inv_sigma2_levels
    if jax.process_count() > 1:
        # multi-host: every process holds the full (host-replicated) problem;
        # build process-spanning global arrays so the edge shards land on
        # each host's local devices and the psums cross hosts
        from .multihost import make_global_array
        edge_cam = make_global_array(edge_cam, mesh, shard)
        edge_point = make_global_array(edge_point, mesh, shard)
        edge_obs = make_global_array(edge_obs, mesh, shard)
        edge_octave = make_global_array(edge_octave, mesh, shard)
        edge_valid = make_global_array(edge_valid, mesh, shard)
        cam_Tcw = make_global_array(cam_Tcw, mesh, repl)
        points = make_global_array(points, mesh, repl)
        free_mask = make_global_array(free_mask, mesh, repl)
        point_valid = make_global_array(point_valid, mesh, repl)
        inv_s2 = make_global_array(inv_s2, mesh, repl)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(repl, repl, repl, repl, shard, shard, shard, shard, shard, repl, repl),
        out_specs=(repl, repl),
        check_vma=False,
    )
    def one_iter(cam_Tcw, points, cam_free, point_valid,
                 e_cam, e_pt, e_obs, e_oct, e_val, inv_s2, use_kernel):
        return _sharded_iteration(
            cam_Tcw, points, cam_free, point_valid,
            e_cam, e_pt, e_obs, e_oct, e_val, inv_s2, use_kernel[0],
            cam_params, damping, cg_iters)

    one_iter = jax.jit(one_iter)

    for i in range(n_iters):
        use_kernel = jnp.asarray([i < n_iters // 2])
        if jax.process_count() > 1:
            from .multihost import make_global_array
            use_kernel = make_global_array(use_kernel, mesh, repl)
        cam_Tcw, points = one_iter(
            cam_Tcw, points, free_mask, point_valid,
            edge_cam, edge_point, edge_obs, edge_octave, edge_valid,
            inv_s2, use_kernel)
    return cam_Tcw, points
