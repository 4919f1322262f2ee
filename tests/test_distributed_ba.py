"""Sharded BA must agree with the single-device solver (SURVEY.md section 4:
'multi-host tests that the reference never had')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_detailed_comments_tpu.parallel.distributed_ba import (
    distributed_global_ba, make_ba_mesh,
)
from orb_slam2_detailed_comments_tpu.optim.global_ba import global_bundle_adjustment

from test_local_ba import build_synthetic_ba, CAM, INV_SIGMA2


class TestDistributedBA:
    def test_mesh_has_8_devices(self):
        assert len(jax.devices()) == 8

    def test_agrees_with_single_device(self):
        prob, cams_true, pts_true = build_synthetic_ba(seed=7, noise_px=0.0)
        mesh = make_ba_mesh()
        cams_d, pts_d = distributed_global_ba(prob, CAM, INV_SIGMA2, mesh,
                                              n_iters=10, cg_iters=50)
        cams_s, pts_s, _ = global_bundle_adjustment(prob, CAM, INV_SIGMA2,
                                                    n_iters=10, cg_iters=50)
        np.testing.assert_allclose(np.asarray(cams_d), np.asarray(cams_s), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pts_d), np.asarray(pts_s), atol=1e-3)

    def test_recovers_ground_truth(self):
        prob, cams_true, pts_true = build_synthetic_ba(seed=8, noise_px=0.0)
        mesh = make_ba_mesh()
        cams, pts = distributed_global_ba(prob, CAM, INV_SIGMA2, mesh,
                                          n_iters=12, cg_iters=60)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=5e-4)

    def test_uneven_edge_padding(self):
        # edge count not divisible by mesh size must still work
        prob, cams_true, _ = build_synthetic_ba(seed=9, n_pts=121, noise_px=0.0)
        assert prob.edge_cam.shape[0] % 8 != 0
        mesh = make_ba_mesh()
        cams, pts = distributed_global_ba(prob, CAM, INV_SIGMA2, mesh,
                                          n_iters=8, cg_iters=40)
        cams = np.asarray(cams)
        for c in range(2, len(cams)):
            np.testing.assert_allclose(cams[c], cams_true[c], atol=1e-3)
