"""Grouped (scatter-free) global BA must agree with the flat edge-list PCG.

The grouped solver is the production path for large problems; it solves
numerically the SAME problem (exact spill lists, no dropped observations),
so poses/points must match the flat solver to float tolerance.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.optim.local_ba import BAProblem
from orb_slam2_detailed_comments_tpu.optim.global_ba import global_bundle_adjustment
from orb_slam2_detailed_comments_tpu.optim.global_ba_grouped import (
    global_bundle_adjustment_grouped, group_global_problem)

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0)
INV_S2 = jnp.asarray([1.0 / 1.2 ** (2 * i) for i in range(8)], jnp.float32)


def build_problem(seed=0, C=16, P=400, stereo_frac=0.3, n_invalid=25):
    rng = np.random.default_rng(seed)
    cams = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
    cams[:, 0, 3] = -np.linspace(0, 3.0, C).astype(np.float32)
    cams[:, 1, 3] = rng.normal(0, 0.02, C).astype(np.float32)
    pts = rng.uniform([-4, -3, 4], [4, 3, 12], (P, 3)).astype(np.float32)

    # skewed degrees: a few landmark points observed by every camera (to
    # exercise the point-spill path with kp_cap below), most by 3-6 cams
    e_cam, e_pt = [], []
    for p in range(P):
        if p < 10:
            obs = np.arange(C)
        else:
            obs = rng.choice(C, rng.integers(2, 7), replace=False)
        e_cam.extend(obs)
        e_pt.extend([p] * len(obs))
    e_cam = np.asarray(e_cam, np.int32)
    e_pt = np.asarray(e_pt, np.int32)
    E = len(e_cam)

    pc = np.einsum("eij,ej->ei", cams[e_cam, :3, :3], pts[e_pt]) + cams[e_cam, :3, 3]
    u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx + rng.normal(0, 0.4, E)
    v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy + rng.normal(0, 0.4, E)
    ur = u - CAM.bf / pc[:, 2] + rng.normal(0, 0.4, E)
    is_st = rng.random(E) < stereo_frac
    obs = np.stack([u, v, np.where(is_st, ur, -1.0)], -1).astype(np.float32)
    valid = np.ones(E, bool)
    valid[rng.choice(E, n_invalid, replace=False)] = False

    return BAProblem(
        cam_Tcw=jnp.asarray(cams),
        cam_free=jnp.asarray([False, False] + [True] * (C - 2)),
        cam_valid=jnp.ones(C, bool),
        points=jnp.asarray(pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)),
        point_valid=jnp.ones(P, bool),
        edge_cam=jnp.asarray(e_cam),
        edge_point=jnp.asarray(e_pt),
        edge_obs=jnp.asarray(obs),
        edge_octave=jnp.asarray(rng.integers(0, 4, E).astype(np.int32)),
        edge_valid=jnp.asarray(valid),
    )


class TestGrouping:
    def test_layout_covers_every_valid_edge_exactly_once(self):
        prob = build_problem()
        gp = group_global_problem(prob, INV_S2, kp_cap=8)
        ge = np.asarray(gp.g_edge).reshape(-1)
        se = np.asarray(gp.sp_edge)
        covered = np.concatenate([ge[ge >= 0], se[se >= 0]])
        expected = np.nonzero(np.asarray(prob.edge_valid))[0]
        assert sorted(covered.tolist()) == sorted(expected.tolist())
        assert len(set(covered.tolist())) == len(covered)

    def test_camera_permutation_covers_storage(self):
        prob = build_problem()
        gp = group_global_problem(prob, INV_S2, kp_cap=8, kc_cap=16)
        csel = np.asarray(gp.c_sel)[np.asarray(gp.c_valid)]
        cspill = np.asarray(gp.cs_sel)[np.asarray(gp.cs_valid)]
        allsel = np.concatenate([csel, cspill])
        n_valid = int(np.asarray(prob.edge_valid).sum())
        assert len(allsel) == n_valid
        assert len(set(allsel.tolist())) == n_valid


class TestAgreementWithFlat:
    @pytest.mark.parametrize("kp_cap,backend", [(8, "gemm"), (64, "gemm"),
                                                (8, "gather"), (8, "dense"),
                                                (64, "dense")])
    def test_matches_flat_solver(self, kp_cap, backend):
        prob = build_problem()
        cams_f, pts_f, inl_f = global_bundle_adjustment(
            prob, CAM, INV_S2, n_iters=6, cg_iters=25)

        gp = group_global_problem(prob, INV_S2, kp_cap=kp_cap)
        from orb_slam2_detailed_comments_tpu.optim.global_ba_grouped import _solve_grouped
        cams_g, pts_g, _, _ = _solve_grouped(gp, CAM, 6, 25, 1e-5, backend)

        # both solvers run LM with step acceptance; the accept compare sees
        # reduction-order float eps (one-hot GEMM limbs vs scatter-add), so
        # damping trajectories can split near the boundary — converged
        # states agree to ~1e-3, not bitwise
        np.testing.assert_allclose(np.asarray(cams_g), np.asarray(cams_f),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(pts_g), np.asarray(pts_f),
                                   atol=2e-2)

    def test_wrapper_inliers_match_flat(self):
        prob = build_problem(seed=3)
        cams_f, pts_f, inl_f = global_bundle_adjustment(
            prob, CAM, INV_S2, n_iters=6, cg_iters=25)
        cams_g, pts_g, inl_g = global_bundle_adjustment_grouped(
            prob, CAM, INV_S2, n_iters=6, cg_iters=25)
        agree = np.mean(np.asarray(inl_g) == np.asarray(inl_f))
        assert agree > 0.995  # boundary chi2 cases may flip either way

    def test_reduces_reprojection_error(self):
        prob = build_problem(seed=1)
        from orb_slam2_detailed_comments_tpu.optim.local_ba import edge_chi2
        cam_params = (CAM.fx, CAM.fy, CAM.cx, CAM.cy, CAM.bf)
        chi_before, _ = edge_chi2(prob.cam_Tcw, prob.points, prob, cam_params, INV_S2)
        cams_g, pts_g, _ = global_bundle_adjustment_grouped(
            prob, CAM, INV_S2, n_iters=8, cg_iters=25)
        chi_after, _ = edge_chi2(cams_g, pts_g, prob, cam_params, INV_S2)
        m = np.asarray(prob.edge_valid)
        assert float(np.median(np.asarray(chi_after)[m])) < \
            0.5 * float(np.median(np.asarray(chi_before)[m]))


class TestChunkedAsyncEquivalence:
    def test_uninterrupted_chunked_matches_fused(self):
        """The interruptible (async) chunked grouped path threads the LM
        state (lambda, cost, activation) through chunk boundaries, so an
        uninterrupted chunked solve runs the IDENTICAL iteration sequence
        as the fused sync solve (round-3; advisor r2 flagged the old
        restart-per-chunk schedule)."""
        from orb_slam2_detailed_comments_tpu.backend.local_mapping import (
            solve_global_ba)
        # E >= 4096 so solve_global_ba routes to the grouped solver
        prob = build_problem(seed=13, C=24, P=1000, n_invalid=40)
        assert int(prob.edge_cam.shape[0]) >= 4096
        cams_f, pts_f = solve_global_ba(prob, CAM, INV_S2, n_iters=6)
        cams_c, pts_c = solve_global_ba(prob, CAM, INV_S2, n_iters=6,
                                        stop_check=lambda: False, chunk=2)
        # identical LM schedule; XLA compiles different trip counts into
        # different fusions, so reductions differ at float-eps level and a
        # cost-compare at the accept boundary can flip (same caveat as
        # test_matches_flat_solver) — converged states agree to ~1e-3/1e-2,
        # not bitwise
        np.testing.assert_allclose(cams_c, cams_f, atol=1e-3)
        np.testing.assert_allclose(pts_c, pts_f, atol=2e-2)

    def test_chunked_respects_stop(self):
        from orb_slam2_detailed_comments_tpu.backend.local_mapping import (
            solve_global_ba)
        prob = build_problem(seed=14, C=24, P=1000)
        calls = {"n": 0}

        def stop_after_two():
            calls["n"] += 1
            return calls["n"] > 2

        out = solve_global_ba(prob, CAM, INV_S2, n_iters=8,
                              stop_check=stop_after_two, chunk=2)
        assert out is None
