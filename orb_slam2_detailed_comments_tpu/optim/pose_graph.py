"""Essential-graph Sim3 pose-graph optimization (loop correction).

TPU-native replacement for Optimizer::OptimizeEssentialGraph
(reference: src/Optimizer.cc:1050-1381): 7-DoF Sim3 vertices per keyframe,
relative-Sim3 edges over four classes — new loop connections, spanning-tree
edges, past loop edges, strong covisibility (weight >= 100) — solved with
Gauss-Newton. Per-edge 7x14 Jacobians come from forward-mode autodiff of
the Sim3 log-composition error (the reference hand-copies g2o's numeric
Jacobians).

Two backends, routed by graph size (backend="auto"):

  * "dense" (K <= DENSE_MAX_VERTICES): the normal system is accumulated by
    scatter-add into a dense (7K, 7K) matrix and solved with Cholesky.
    Exact inner solve; fine after keyframe culling at loop-test scales.
  * "cg" (large K — KITTI-00-class keyframe counts): never materializes
    H. Block-Jacobi-preconditioned CG on the implicit normal system in
    spanning-tree-relative coordinates; all vertex<->edge data movement
    is full-f32 one-hot GEMM on the MXU (the scatter/gather-free pattern
    optim/global_ba_grouped.py proved 3.6-12x on TPU; duplicate-index
    scatter-adds serialize — but unlike BA, CG here needs ~1e-6 matvec
    accuracy, so these GEMMs run at Precision.HIGHEST, not bf16 limbs).
    The (K, 2E) one-hot is built once per solve; a CG matvec is two GEMMs
    (expand + reduce) plus per-edge 7x7 block products. The inner solve
    runs to a 1e-8 preconditioned-residual reduction (early-exit
    while_loop), not a fixed schedule.

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


def _sanitized_edges(prob: "PoseGraphProblem"):
    """Make invalid edges numerically inert (not just weight-0): endpoint
    indices clamped to vertex 0 and Sji replaced by identity, so a padded
    edge's residual/Jacobian is finite (log(I.S0.S0^-1) = 0) and w=0 can
    mask it without NaN*0 contamination."""
    ev = prob.edge_valid
    edge_i = jnp.where(ev, prob.edge_i, 0)
    edge_j = jnp.where(ev, prob.edge_j, 0)
    eye4 = jnp.broadcast_to(jnp.eye(4, dtype=prob.edge_Sji.dtype),
                            prob.edge_Sji.shape)
    edge_Sji = jnp.where(ev[:, None, None], prob.edge_Sji, eye4)
    return edge_i, edge_j, edge_Sji


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _optimize_pose_graph_dense(prob: PoseGraphProblem, n_iters: int = 20,
                               damping: float = 1e-8):
    """Run GN on the pose graph; returns optimized (K, 4, 4) Sim3 poses."""
    K = prob.S_init.shape[0]
    zero7 = jnp.zeros(7)

    err_fn = jax.vmap(_edge_error, in_axes=(None, None, 0, 0, 0))
    Ji_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=0), in_axes=(None, None, 0, 0, 0))
    Jj_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=1), in_axes=(None, None, 0, 0, 0))

    free = (prob.vertex_valid & ~prob.vertex_fixed)
    free7 = jnp.repeat(free, 7)
    # sanitize padded/invalid edges BEFORE differentiation: w=0 masks the
    # contribution, but a garbage Sji or endpoint would put NaN through
    # log_sim3 and NaN*0 poisons the normal system (callers padding to
    # static shapes rely on this).
    edge_i, edge_j, edge_Sji = _sanitized_edges(prob)

    def body(_, S):
        Si = S[edge_i]
        Sj = S[edge_j]
        r = err_fn(zero7, zero7, Si, Sj, edge_Sji)            # (E, 7)
        Ji = Ji_fn(zero7, zero7, Si, Sj, edge_Sji)            # (E, 7, 7)
        Jj = Jj_fn(zero7, zero7, Si, Sj, edge_Sji)
        w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)

        Hii = jnp.einsum("eri,erj,e->eij", Ji, Ji, w)
        Hjj = jnp.einsum("eri,erj,e->eij", Jj, Jj, w)
        Hij = jnp.einsum("eri,erj,e->eij", Ji, Jj, w)
        bi = jnp.einsum("eri,er,e->ei", Ji, r, w)
        bj = jnp.einsum("eri,er,e->ei", Jj, r, w)

        H = jnp.zeros((K, 7, K, 7))
        H = H.at[edge_i, :, edge_i, :].add(Hii)
        H = H.at[edge_j, :, edge_j, :].add(Hjj)
        H = H.at[edge_i, :, edge_j, :].add(Hij)
        H = H.at[edge_j, :, edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((K, 7)).at[edge_i].add(bi).at[edge_j].add(bj)

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


@functools.partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
def _optimize_pose_graph_cg(prob: PoseGraphProblem, anc: jnp.ndarray,
                            n_iters: int = 20, cg_iters: int = 128,
                            damping: float = 1e-8):
    """Matrix-free GN in RELATIVE (spanning-tree) coordinates.

    Plain block-Jacobi PCG on the absolute-pose normal system stalls on
    pose graphs: information propagates ~1 vertex per iteration along the
    odometry chain, so the low-frequency drift modes a loop closure must
    fix need O(diameter) iterations (measured: wrong by meters at K=256,
    diverging at K=1408). The classic fix is to solve for PARENT-RELATIVE
    corrections: with x = P u, P = diag(free) @ A @ diag(free), where
    A[k, a] = 1 iff a is an ancestor-or-self of k in the spanning tree, a
    single relative coordinate u_a moves the whole subtree below a — the
    long-range modes become single coordinates and Jacobi-PCG converges in
    tens of iterations. On TPU, A rides the MXU as one (K, K) bfloat16
    GEMM per application (entries exactly 0/1; f32 operands split into
    limbs), and all vertex<->edge data movement is the same k-limb one-hot
    GEMM pattern as optim/global_ba_grouped.py. No dense Hessian, no
    duplicate-index scatters.

    The preconditioner is the exact block diagonal of P^T H P, assembled
    with three (K, E) @ (E, 49) GEMMs from the per-edge 7x7 blocks and the
    edge-endpoint rows of P.
    """
    K = prob.S_init.shape[0]
    E = prob.edge_i.shape[0]
    zero7 = jnp.zeros(7)

    err_fn = jax.vmap(_edge_error, in_axes=(None, None, 0, 0, 0))
    Ji_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=0), in_axes=(None, None, 0, 0, 0))
    Jj_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=1), in_axes=(None, None, 0, 0, 0))

    free = (prob.vertex_valid & ~prob.vertex_fixed)
    freef = free.astype(jnp.float32)[:, None]                # (K, 1)
    # invalid/padded edges made numerically inert (see _sanitized_edges)
    edge_i, edge_j, edge_Sji = _sanitized_edges(prob)
    # one (K, 2E) one-hot covering both endpoint roles: columns [0, E) are
    # edge i-endpoints, [E, 2E) j-endpoints -> one GEMM per expand/reduce.
    # All GEMMs here are FULL f32 (Precision.HIGHEST): pose-graph CG needs
    # ~1e-6 matvec accuracy or it stalls meters short (round 2's bf16-limb
    # GEMMs, measured on TPU: 12.2 -> 8.4 m at K=256 vs f32's 0.007 m);
    # the matrices are tiny, precision costs nothing here.
    HI = jax.lax.Precision.HIGHEST
    ends = jnp.concatenate([edge_i, edge_j])
    oh = (jnp.arange(K, dtype=jnp.int32)[:, None] == ends[None, :]
          ).astype(jnp.float32)                              # (K, 2E)
    w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)

    # P = diag(free) A diag(free) as masked ancestor indicator (K, K)
    P = anc.astype(jnp.float32) * freef * freef[:, 0][None, :]

    def apply_P(u):
        """x = P u, (K, 7)."""
        return jax.lax.dot_general(P, u, (((1,), (0,)), ((), ())),
                                   precision=HI)

    def apply_Pt(x):
        return jax.lax.dot_general(P, x, (((0,), (0,)), ((), ())),
                                   precision=HI)

    def expand(x):
        """(K, n) -> i-cols (E, n), j-cols (E, n) in one GEMM."""
        both = jax.lax.dot_general(oh, x, (((0,), (0,)), ((), ())),
                                   precision=HI)             # (2E, n)
        return both[:E], both[E:]

    def reduce_(yi, yj):
        """i-cols (E, n) + j-cols (E, n) -> (K, n) in one GEMM."""
        y = jnp.concatenate([yi, yj], 0)                     # (2E, n)
        return jax.lax.dot_general(oh, y, (((1,), (0,)), ((), ())),
                                   precision=HI)

    def body(_, S):
        Se_i, Se_j = expand(S.reshape(K, 16))                # full-f32 poses
        Se_i = Se_i.reshape(E, 4, 4)
        Se_j = Se_j.reshape(E, 4, 4)
        r = err_fn(zero7, zero7, Se_i, Se_j, edge_Sji)       # (E, 7)
        Ji = Ji_fn(zero7, zero7, Se_i, Se_j, edge_Sji)       # (E, 7, 7)
        Jj = Jj_fn(zero7, zero7, Se_i, Se_j, edge_Sji)

        Hii = jnp.einsum("eri,erj,e->eij", Ji, Ji, w)
        Hjj = jnp.einsum("eri,erj,e->eij", Jj, Jj, w)
        Hij = jnp.einsum("eri,erj,e->eij", Ji, Jj, w)
        bi = jnp.einsum("eri,er,e->ei", Ji, r, w)
        bj = jnp.einsum("eri,er,e->ei", Jj, r, w)
        b = reduce_(bi, bj) * freef                          # (K, 7)

        # Levenberg scale from the absolute-space block diagonal
        D = reduce_(Hii.reshape(E, 49), Hjj.reshape(E, 49)).reshape(K, 7, 7)
        tr = jnp.sum(jnp.trace(D, axis1=-2, axis2=-1) * freef[:, 0])
        nfree = jnp.maximum(jnp.sum(freef), 1.0)
        lam = damping * tr / (7.0 * nfree) + 1e-10
        eye7 = jnp.eye(7)

        def matvec_x(x):
            """H x + lam x on the free subspace (absolute coordinates)."""
            xm = x * freef
            xe_i, xe_j = expand(xm)
            yi = (jnp.einsum("eij,ej->ei", Hii, xe_i)
                  + jnp.einsum("eij,ej->ei", Hij, xe_j))
            yj = (jnp.einsum("eji,ej->ei", Hij, xe_i)
                  + jnp.einsum("eij,ej->ei", Hjj, xe_j))
            return (reduce_(yi, yj) + lam * xm) * freef

        def matvec_u(v):
            return apply_Pt(matvec_x(apply_P(v)))

        # exact block diagonal of P^T H P: for ancestor column a,
        # D_u[a] = sum_e [Pi_a Hii + Pi_a Pj_a (Hij + Hij^T) + Pj_a Hjj]
        # with Pi = P[edge_i] (E, K) 0/1 path indicators (Pi^2 = Pi).
        Pi = jax.lax.dot_general(
            oh[:, :E], P, (((0,), (0,)), ((), ())), precision=HI)  # (E, K)
        Pj = jax.lax.dot_general(
            oh[:, E:], P, (((0,), (0,)), ((), ())), precision=HI)
        Hsym = (Hij + jnp.swapaxes(Hij, -1, -2)).reshape(E, 49)

        def du_gemm(coef, blk49):
            return jax.lax.dot_general(
                coef, blk49, (((0,), (0,)), ((), ())),
                precision=HI)                                # (K, 49)

        D_u = (du_gemm(Pi, Hii.reshape(E, 49))
               + du_gemm(Pi * Pj, Hsym)
               + du_gemm(Pj, Hjj.reshape(E, 49))).reshape(K, 7, 7)
        # P columns at fixed/unreached vertices are zero -> identity blocks
        col_live = (jnp.abs(P).sum(axis=0) > 0.5)[:, None, None]
        D_u = D_u + lam * eye7
        D_u = jnp.where(col_live, D_u, eye7)
        Minv = jnp.linalg.inv(D_u)

        def precond(rr):
            return jnp.einsum("kij,kj->ki", Minv, rr)

        rhs = -apply_Pt(b)
        x0 = jnp.zeros_like(rhs)
        z0 = precond(rhs)
        rz0 = jnp.sum(rhs * z0)
        # residual-based stopping: run until the preconditioned residual
        # norm has dropped 1e8x (residual ~1e-4 relative — inner accuracy
        # comparable to the dense Cholesky at f32) or the cap. Late GN
        # iterations exit in a handful of steps, so the AVERAGE per-GN
        # cost stays far below the cap even though the first iterations
        # may need O(K) steps (round-2 used a fixed K/4 schedule, which
        # left meters of residual drift at KITTI-00 scale).
        tol = 1e-8 * jnp.maximum(rz0, 0.0) + 1e-30

        def cg_cond(st):
            i, x, rr, z, p, rz = st
            return (i < cg_iters) & (rz > tol)

        def cg_body(st):
            i, x, rr, z, p, rz = st
            Ap = matvec_u(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return i + 1, x, rr, z, p, rz_new

        st = (jnp.int32(0), x0, rhs, z0, z0, rz0)
        u = jax.lax.while_loop(cg_cond, cg_body, st)[1]
        dx = apply_P(u) * freef
        # GN safeguarding: cap only the ROTATION+SCALE tangent (phi, sigma
        # = dx[:, 3:7]) so exp_sim3 stays in its domain; translation steps
        # are linear-safe at any magnitude and a KITTI-00 loop legitimately
        # needs tens-of-meter corrections (round 2 capped the FULL tangent
        # at 10, throttling exactly those corrections).
        rot = jnp.sqrt(jnp.sum(dx[:, 3:7] ** 2, axis=1))
        rmax = jnp.max(rot)
        scale = jnp.where(rmax > 1.5, 1.5 / rmax, 1.0)
        dx = dx * scale
        return jax.vmap(lambda d, s: exp_sim3(d) @ s)(dx, S)

    return jax.lax.fori_loop(0, n_iters, body, prob.S_init)


def _ancestor_matrix(parent: "np.ndarray", K: int) -> "np.ndarray":
    """(K, K) bool: anc[k, a] = a is an ancestor-or-self of k. Host-side,
    tolerant of unordered ids and broken chains (unresolved nodes become
    roots after K passes)."""
    import numpy as np
    anc = np.zeros((K, K), bool)
    done = np.zeros(K, bool)
    parent = np.asarray(parent)
    roots = (parent < 0) | (parent >= K) | (parent == np.arange(K))
    for k in np.nonzero(roots)[0]:
        anc[k, k] = True
        done[k] = True
    for _ in range(K):
        todo = np.nonzero(~done)[0]
        if todo.size == 0:
            break
        progress = False
        for k in todo:
            p = parent[k]
            if done[p]:
                anc[k] = anc[p]
                anc[k, k] = True
                done[k] = True
                progress = True
        if not progress:
            for k in np.nonzero(~done)[0]:  # cycle fallback: self-rooted
                anc[k, k] = True
                done[k] = True
            break
    return anc


def _spanning_tree_from_edges(prob: PoseGraphProblem) -> "np.ndarray":
    """BFS parents over the edge list, rooted at the fixed vertices (or
    vertex 0). Used when the caller has no spanning tree at hand."""
    import numpy as np
    K = prob.S_init.shape[0]
    ei = np.asarray(prob.edge_i)
    ej = np.asarray(prob.edge_j)
    ev = np.asarray(prob.edge_valid)
    adj = [[] for _ in range(K)]
    for a, b in zip(ei[ev], ej[ev]):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    parent = np.full(K, -1, np.int64)
    seen = np.zeros(K, bool)
    fixed = np.asarray(prob.vertex_fixed)
    queue = list(np.nonzero(fixed)[0]) or [0]
    for q in queue:
        seen[q] = True
    while queue:
        a = queue.pop(0)
        for b in adj[a]:
            if not seen[b]:
                seen[b] = True
                parent[b] = a
                queue.append(b)
    return parent


DENSE_MAX_VERTICES = 256  # dense (7K,7K) Cholesky fine up to here


def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20,
                        damping: float = 1e-8, backend: str = "auto",
                        cg_iters: int = 0, parent=None):
    """Optimize the essential graph; returns (K, 4, 4) Sim3 poses.

    backend="auto" routes small graphs to the exact dense Cholesky solver
    and KITTI-00-class graphs (K > DENSE_MAX_VERTICES) to the matrix-free
    PCG solver in spanning-tree-relative coordinates (see
    _optimize_pose_graph_cg). `parent` is the spanning tree (parent[k] < 0
    for roots); if absent, a BFS tree over the edges is used."""
    K = prob.S_init.shape[0]
    if backend == "auto":
        backend = "dense" if K <= DENSE_MAX_VERTICES else "cg"
    if backend == "dense":
        return _optimize_pose_graph_dense(prob, n_iters, damping)
    if parent is None:
        parent = _spanning_tree_from_edges(prob)
    anc = jnp.asarray(_ancestor_matrix(parent, K))
    if not cg_iters:
        # iteration CAP, not schedule: residual-based stopping exits early.
        # 2K covers the measured worst case (K iterations reach the f32
        # convergence plateau on KITTI-00-scale circle graphs).
        cg_iters = int(min(max(2 * K, 256), 8192))
    return _optimize_pose_graph_cg(prob, anc, n_iters, cg_iters, damping)
