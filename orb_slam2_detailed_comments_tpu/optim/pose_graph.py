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


def _safeguard_step(dx):
    """GN step safeguard (no LM acceptance loop in these solvers): cap the
    ROTATION+SCALE tangent (dx[:, 3:7]) at 1.5 so exp_sim3 stays in its
    domain, and the TRANSLATION tangent at 100 — far above any legitimate
    correction in nondimensionalized units (drift/L <= ~1) but finite, so
    a pathological inexact inner solve (CG stagnating at its cap, a
    near-singular Woodbury core) cannot fling poses arbitrarily far and
    poison the next linearization. Round 2 capped the FULL tangent at 10,
    throttling exactly the tens-of-meter corrections a KITTI loop needs."""
    rot = jnp.sqrt(jnp.sum(dx[:, 3:7] ** 2, axis=1))
    rmax = jnp.max(rot)
    dx = dx * jnp.where(rmax > 1.5, 1.5 / rmax, 1.0)
    tr = jnp.sqrt(jnp.sum(dx[:, :3] ** 2, axis=1))
    tmax = jnp.max(tr)
    return dx * jnp.where(tmax > 100.0, 100.0 / tmax, 1.0)


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
        dx = _safeguard_step(dx)
        return jax.vmap(lambda d, s: exp_sim3(d) @ s)(dx, S)

    return jax.lax.fori_loop(0, n_iters, body, prob.S_init)


def _band_cholesky(diag, off, W: int):
    """Block-banded Cholesky via lax.scan (sequential frontal window).

    diag (K, 7, 7): diagonal blocks. off (K, W, 7, 7): off[k, d] is the
    coupling block H[k, k-d-1] (row k, column k-d-1). Returns
    (Ld (K, 7, 7) lower-triangular diagonal factors,
     Lc (K, W*7, 7) below-diagonal column blocks: rows 7j:7j+7 of Lc[k]
     hold L[k+1+j, k]).

    The scan carries the active (W+1)-block frontal Schur window; each
    step factors one 7x7 pivot, forms its column, downdates the trailing
    window, and slides one block forward. O(K W^2) work, K sequential
    steps of tiny dense ops — the shape a TPU handles in ~mics/step,
    where a full dense Cholesky of (7K)^2 costs ~309 ms at K=1408."""
    K = diag.shape[0]
    s = 7
    ws = (W + 1) * s
    pad = jnp.zeros((W + 1, s, s), diag.dtype)
    diag_pad = jnp.concatenate([diag, pad], axis=0)
    off_pad = jnp.concatenate([off, jnp.zeros((W + 1, W, s, s), off.dtype)],
                              axis=0)

    # initial frontal window: vertices 0..W (requires K > W)
    init = jnp.zeros((ws, ws), diag.dtype)
    for a in range(W + 1):
        init = init.at[a * s:(a + 1) * s, a * s:(a + 1) * s].set(diag_pad[a])
        for b in range(a):
            d = a - b - 1
            if d < W:
                blk = off_pad[a, d]
                init = init.at[a * s:(a + 1) * s, b * s:(b + 1) * s].set(blk)
                init = init.at[b * s:(b + 1) * s, a * s:(a + 1) * s].set(blk.T)

    # xs for step k: data of the incoming vertex t = k + W + 1
    xs_diag = diag_pad[W + 1:W + 1 + K]
    xs_off = off_pad[W + 1:W + 1 + K]

    def step(S_win, xs):
        d_in, off_in = xs
        Ld = jnp.linalg.cholesky(S_win[:s, :s])
        rest = S_win[s:, :s]                                  # (W*7, 7)
        Lcol = jax.scipy.linalg.solve_triangular(
            Ld, rest.T, lower=True).T                         # (W*7, 7)
        S_rest = S_win[s:, s:] - Lcol @ Lcol.T
        # incoming row: coupling of vertex t to window slots j=0..W-1
        # (vertices k+1+j): distance t-1-(k+1+j) = W-1-j
        row_in = jnp.concatenate([off_in[W - 1 - j] for j in range(W)],
                                 axis=1)                      # (7, W*7)
        S_new = jnp.zeros_like(S_win)
        S_new = S_new.at[:W * s, :W * s].set(S_rest)
        S_new = S_new.at[W * s:, :W * s].set(row_in)
        S_new = S_new.at[:W * s, W * s:].set(row_in.T)
        S_new = S_new.at[W * s:, W * s:].set(d_in)
        return S_new, (Ld, Lcol)

    _, (Ld, Lc) = jax.lax.scan(step, init, (xs_diag, xs_off))
    return Ld, Lc


def _band_solve(Ld, Lc, R, W: int):
    """Solve B x = R with the banded factors (B = L L^T). R: (K, 7, m)."""
    K, s, m = R.shape

    def fwd(pend, xs):
        Ldk, Lck, rk = xs
        yk = jax.scipy.linalg.solve_triangular(Ldk, rk - pend[0], lower=True)
        contrib = (Lck @ yk).reshape(W, s, m)
        shifted = jnp.concatenate([pend[1:], jnp.zeros((1, s, m), R.dtype)], 0)
        return shifted + contrib, yk

    _, Y = jax.lax.scan(fwd, jnp.zeros((W, s, m), R.dtype), (Ld, Lc, R))

    def bwd(xf, xs):
        Ldk, Lck, yk = xs
        Lb = Lck.reshape(W, s, s)
        acc = jnp.einsum("wji,wjm->im", Lb, xf)
        xk = jax.scipy.linalg.solve_triangular(Ldk.T, yk - acc, lower=False)
        return jnp.concatenate([xk[None], xf[:-1]], 0), xk

    _, X = jax.lax.scan(bwd, jnp.zeros((W, s, m), R.dtype), (Ld, Lc, Y),
                        reverse=True)
    return X


@functools.partial(jax.jit, static_argnames=("n_iters", "W"))
def _optimize_pose_graph_banded(prob: PoseGraphProblem, short_sel, long_sel,
                                anchor_sel, n_iters: int = 20, W: int = 8,
                                damping: float = 1e-8):
    """EXACT direct GN solve at KITTI-00 scale: banded block-Cholesky +
    Woodbury long-range correction.

    In temporal (keyframe-id) order the essential graph is nearly block
    banded: spanning-tree and strong-covisibility edges connect keyframes
    a few ids apart; only loop(-connection) edges are long-range. So
    H = B + U D U^T with B block-banded (half-bandwidth W blocks) and the
    low-rank part carrying (a) the sqrt-weighted Jacobian rows of the M
    long edges (D=+I) and (b) NEGATIVE copies of artificial stiffness
    anchors added to B (D=-I, see below). Woodbury:

        (B + U D U^T)^{-1} r = B^{-1} r
            - B^{-1} U (D^{-1} + U^T B^{-1} U)^{-1} U^T B^{-1} r

    needs one banded factorization (O(K W^2), lax.scan) + a batched
    banded solve with 1 + 7(M+c) right-hand sides + a tiny dense core
    (LU — indefinite because of the anchor signs).

    The anchors are the f32 trick: a one-end-anchored pose chain has
    condition ~K^2 (~3e6 at K=1408 — the far-end Cholesky pivots decay
    like 1/k and drown in accumulated f32 downdate error; measured: NaN
    factor at K=1408, where g2o survives only because it factors in
    f64). Adding sigma*I at every ~96th free vertex INSIDE B caps the
    chain segment length, so cond(B) ~ (96/pi)^2 ~ 1e3 — rock-solid in
    f32 — and the Woodbury term subtracts the anchors EXACTLY, so the
    assembled step still solves the true H. Matches g2o's exact solve
    (reference: Optimizer.cc:1050-1381) without f64 emulation (measured
    260 ms/factorization on TPU) at a fraction of the dense backend's
    cost."""
    K = prob.S_init.shape[0]
    M = int(long_sel.shape[0])
    C = int(anchor_sel.shape[0])
    zero7 = jnp.zeros(7)
    eye7 = jnp.eye(7)

    err_fn = jax.vmap(_edge_error, in_axes=(None, None, 0, 0, 0))
    Ji_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=0), in_axes=(None, None, 0, 0, 0))
    Jj_fn = jax.vmap(jax.jacfwd(_edge_error, argnums=1), in_axes=(None, None, 0, 0, 0))

    free = (prob.vertex_valid & ~prob.vertex_fixed)
    freef = free.astype(jnp.float32)[:, None]
    edge_i, edge_j, edge_Sji = _sanitized_edges(prob)
    w = jnp.where(prob.edge_valid, prob.edge_weight, 0.0)

    s_i = edge_i[short_sel]
    s_j = edge_j[short_sel]
    l_i = edge_i[long_sel]
    l_j = edge_j[long_sel]

    def body(_, S):
        Si = S[edge_i]
        Sj = S[edge_j]
        r = err_fn(zero7, zero7, Si, Sj, edge_Sji)            # (E, 7)
        Ji = Ji_fn(zero7, zero7, Si, Sj, edge_Sji)            # (E, 7, 7)
        Jj = Jj_fn(zero7, zero7, Si, Sj, edge_Sji)

        # mask fixed-vertex columns at the Jacobian level: their rows and
        # columns of H (and entries of b) vanish identically
        fi = free[edge_i].astype(jnp.float32)[:, None, None]
        fj = free[edge_j].astype(jnp.float32)[:, None, None]
        Jim = Ji * fi
        Jjm = Jj * fj

        Hii = jnp.einsum("eri,erj,e->eij", Jim, Jim, w)
        Hjj = jnp.einsum("eri,erj,e->eij", Jjm, Jjm, w)
        Hij = jnp.einsum("eri,erj,e->eij", Jim, Jjm, w)
        bi = jnp.einsum("eri,er,e->ei", Jim, r, w)
        bj = jnp.einsum("eri,er,e->ei", Jjm, r, w)
        b = jnp.zeros((K, 7)).at[edge_i].add(bi).at[edge_j].add(bj)

        # Levenberg scale from the diagonal trace (free vertices only)
        D = jnp.zeros((K, 7, 7)).at[edge_i].add(Hii).at[edge_j].add(Hjj)
        tr = jnp.sum(jnp.trace(D, axis1=-2, axis2=-1) * freef[:, 0])
        nfree = jnp.maximum(jnp.sum(freef), 1.0)
        lam = damping * tr / (7.0 * nfree) + 1e-10

        # --- banded part: short edges only (long edges live in U D U^T) ---
        # anchor stiffness: strong enough to pin each ~96-vertex segment's
        # floppy mode (~(pi/96)^2 of the mean edge scale), weak enough to
        # keep the Woodbury cancellation (amplification ~ sigma/lambda_min)
        # inside f32 — residual error is killed by the refinement steps
        sigma = 1e-2 * tr / (7.0 * nfree)
        diag = (jnp.zeros((K, 7, 7))
                .at[s_i].add(Hii[short_sel])
                .at[s_j].add(Hjj[short_sel])
                .at[anchor_sel].add(sigma * eye7))
        diag = jnp.where(free[:, None, None], diag + lam * eye7, eye7)
        lo = jnp.minimum(s_i, s_j)
        hi = jnp.maximum(s_i, s_j)
        delta = hi - lo
        sHij = Hij[short_sel]
        # block (hi, lo): Hij if i is the row (i > j), else Hij^T
        X = jnp.where((s_i > s_j)[:, None, None], sHij,
                      jnp.swapaxes(sHij, -1, -2))
        # (hi, delta) is unique per edge pair -> fast unique-index scatter;
        # sanitized padded edges land at delta=0 -> index -1 wraps, adds 0
        off = jnp.zeros((K, W, 7, 7)).at[hi, delta - 1].add(X)

        Ld, Lc = _band_cholesky(diag, off, W)

        rhs = (-b * freef).reshape(K * 7)

        def matvec_H(x):
            """Full-H matvec from the edge blocks (for refinement)."""
            xk = x.reshape(K, 7)
            xi = xk[edge_i]
            xj = xk[edge_j]
            yi = (jnp.einsum("eij,ej->ei", Hii, xi)
                  + jnp.einsum("eij,ej->ei", Hij, xj))
            yj = (jnp.einsum("eji,ej->ei", Hij, xi)
                  + jnp.einsum("eij,ej->ei", Hjj, xj))
            y = jnp.zeros((K, 7)).at[edge_i].add(yi).at[edge_j].add(yj)
            return ((y + lam * xk) * freef).reshape(K * 7)

        n_lr = 7 * (M + C)
        if n_lr > 0:
            # U columns: long-edge Jacobian rows (sign +1), then anchor
            # blocks sqrt(sigma)*I at each anchor vertex (sign -1)
            Ucols = jnp.zeros((K, 7, M + C, 7))
            if M > 0:
                sw = jnp.sqrt(w[long_sel])[:, None, None]
                arangeM = jnp.arange(M)
                Ucols = Ucols.at[l_i, :, arangeM, :].add(
                    sw * jnp.swapaxes(Jim[long_sel], -1, -2))
                Ucols = Ucols.at[l_j, :, arangeM, :].add(
                    sw * jnp.swapaxes(Jjm[long_sel], -1, -2))
            if C > 0:
                Ucols = Ucols.at[anchor_sel, :, M + jnp.arange(C), :].add(
                    jnp.sqrt(sigma) * eye7)
            U = Ucols.reshape(K * 7, n_lr)
            R = jnp.concatenate([rhs[:, None], U], axis=1)   # (7K, 1+n_lr)
            Y = _band_solve(Ld, Lc, R.reshape(K, 7, 1 + n_lr), W)
            Y = Y.reshape(K * 7, 1 + n_lr)
            Z = Y[:, 1:]
            dsign = jnp.concatenate([jnp.ones(7 * M), -jnp.ones(7 * C)])
            core = jnp.diag(dsign) + U.T @ Z    # indefinite -> LU
            # symmetric diagonal equilibration: mixed rotation/translation
            # scales leave the raw core at cond ~1e8, beyond f32 LU
            ds = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diag(core)), 1e-12))
            core_eq = core / ds[:, None] / ds[None, :]
            lu, piv = jax.scipy.linalg.lu_factor(core_eq)

            def apply_Minv(v, y_pre=None):
                yv = (_band_solve(Ld, Lc, v.reshape(K, 7, 1), W)
                      .reshape(K * 7) if y_pre is None else y_pre)
                t = jax.scipy.linalg.lu_solve((lu, piv), (U.T @ yv) / ds) / ds
                return yv - Z @ t

            x = apply_Minv(rhs, Y[:, 0])
            # 2 steps of iterative refinement against the TRUE H: mops up
            # the f32 Woodbury cancellation (anchors enter B stiff and are
            # subtracted large-against-large)
            for _ in range(2):
                x = x + apply_Minv(rhs - matvec_H(x))
        else:
            x = _band_solve(Ld, Lc, rhs.reshape(K, 7, 1), W).reshape(K * 7)

        dx = x.reshape(K, 7) * freef
        dx = _safeguard_step(dx)
        return jax.vmap(lambda d, s_: exp_sim3(d) @ s_)(dx, S)

    return jax.lax.fori_loop(0, n_iters, body, prob.S_init)


BANDED_W_CHOICES = (4, 8, 16)   # quantized half-bandwidths (block units)
BANDED_LONG_CAP = 48            # max Woodbury edges
BANDED_ANCHOR_STRIDE = 96       # f32 conditioning: anchor every ~96th vertex


def _partition_edges_banded(prob: PoseGraphProblem):
    """Host-side routing: pick the smallest quantized bandwidth that
    leaves at most BANDED_LONG_CAP long-range edges, and choose the f32
    stiffness-anchor vertices (free, every ~96th). Returns
    (W, short_sel, long_sel, anchor_sel) or None if the graph doesn't
    band."""
    import numpy as np
    K = int(prob.S_init.shape[0])
    ei = np.asarray(prob.edge_i)
    ej = np.asarray(prob.edge_j)
    ev = np.asarray(prob.edge_valid)
    d = np.abs(ei.astype(np.int64) - ej.astype(np.int64))
    free_idx = np.nonzero(np.asarray(prob.vertex_valid)
                          & ~np.asarray(prob.vertex_fixed))[0]
    anchors = free_idx[BANDED_ANCHOR_STRIDE // 2::BANDED_ANCHOR_STRIDE]
    for Wc in BANDED_W_CHOICES:
        if Wc >= K - 1:
            break
        long_mask = ev & (d > Wc)
        if int(long_mask.sum()) + anchors.size <= BANDED_LONG_CAP:
            short_sel = np.nonzero(ev & (d <= Wc))[0].astype(np.int32)
            long_sel = np.nonzero(long_mask)[0].astype(np.int32)
            return Wc, short_sel, long_sel, anchors.astype(np.int32)
    return None


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

    backend="auto" routes small graphs to the exact dense Cholesky solver;
    KITTI-00-class graphs (K > DENSE_MAX_VERTICES) go to the banded
    block-Cholesky + Woodbury direct solver when the graph bands in
    temporal order (it always does for odometry + covisibility + a few
    loop edges), falling back to the matrix-free PCG solver in
    spanning-tree-relative coordinates for pathological edge sets.
    `parent` is the spanning tree (parent[k] < 0 for roots); if absent, a
    BFS tree over the edges is used (CG backend only)."""
    K = prob.S_init.shape[0]
    import numpy as np
    # nondimensionalize: scale translations by the trajectory scale (a
    # world-coordinate scaling conjugation). Raw KITTI-class units put
    # translation Jacobians at O(100) against O(1) rotations, which costs
    # ~4 decimal digits of f32 conditioning in every backend (measured:
    # Woodbury core cond 7.5e8 unscaled).
    #
    # DELIBERATE DEVIATION from g2o: the per-edge error becomes
    # (rho/L, phi, sigma), i.e. the implicit information matrix weights
    # translation residuals by 1/L^2 relative to rotation instead of the
    # reference's identity in raw meters (Optimizer.cc:1129 matLambda =
    # identity). Neither weighting is covariance-derived; raw-meter
    # identity makes the objective unit-dependent (translation dominates
    # rotation ~1e4x at KITTI scale), scaled identity makes it
    # scale-invariant and f32-solvable. At the near-zero residuals a
    # consistent essential graph reaches the optima coincide; on
    # inconsistent graphs the drift distribution differs from g2o's.
    t_rms = float(np.sqrt(np.mean(np.asarray(prob.S_init)[:, :3, 3] ** 2)))
    L = max(1.0, t_rms)
    if L > 1.0:
        S_init = np.asarray(prob.S_init).copy()
        S_init[:, :3, 3] /= L
        Sji = np.asarray(prob.edge_Sji).copy()
        Sji[:, :3, 3] /= L
        prob = prob._replace(S_init=jnp.asarray(S_init),
                             edge_Sji=jnp.asarray(Sji))

    def _rescale(S_out):
        if L <= 1.0:
            return S_out
        S_out = np.asarray(S_out).copy()
        S_out[:, :3, 3] *= L
        return jnp.asarray(S_out)

    if backend == "auto":
        backend = "dense" if K <= DENSE_MAX_VERTICES else "banded"
    if backend == "banded":
        part = _partition_edges_banded(prob)
        if part is not None:
            W, short_sel, long_sel, anchor_sel = part
            return _rescale(_optimize_pose_graph_banded(
                prob, jnp.asarray(short_sel), jnp.asarray(long_sel),
                jnp.asarray(anchor_sel), n_iters, W, damping))
        backend = "cg"  # graph doesn't band: fall through
    if backend == "dense":
        return _rescale(_optimize_pose_graph_dense(prob, n_iters, damping))
    if parent is None:
        parent = _spanning_tree_from_edges(prob)
    anc = jnp.asarray(_ancestor_matrix(parent, K))
    if not cg_iters:
        # iteration CAP, not schedule: residual-based stopping exits early.
        # 2K covers the measured worst case (K iterations reach the f32
        # convergence plateau on KITTI-00-scale circle graphs).
        cg_iters = int(min(max(2 * K, 256), 8192))
    return _rescale(_optimize_pose_graph_cg(prob, anc, n_iters, cg_iters,
                                            damping))
