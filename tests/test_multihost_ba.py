"""True multi-PROCESS distributed BA: two OS processes, 4 virtual CPU
devices each, Gloo TCP collectives between them (the CPU stand-in for
cross-host DCN on a TPU pod). The sharded result must agree with the
single-process single-device solver — the multi-host test class the
reference never had (SURVEY.md section 4)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_local_ba import build_synthetic_ba, CAM, INV_SIGMA2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, nproc, solver):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    out = str(tmp_path / "mh.npz")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(nproc), str(port), out,
             solver],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in range(nproc)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for rank, (p, text) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{text[-3000:]}"
    return np.load(out)


class TestMultihostBA:
    def test_two_process_gloo_agrees_with_single_device(self, tmp_path):
        here = os.path.dirname(os.path.abspath(__file__))
        worker = os.path.join(here, "multihost_worker.py")
        out = str(tmp_path / "mh.npz")
        port = _free_port()

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # workers set their own device counts
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(rank), "2", str(port), out],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for rank in range(2)
        ]
        outputs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multihost worker timed out")
            outputs.append(stdout.decode(errors="replace"))
        for rank, (p, text) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{text[-3000:]}"

        got = np.load(out)

        from orb_slam2_detailed_comments_tpu.optim.global_ba import (
            global_bundle_adjustment,
        )
        prob, cams_true, pts_true = build_synthetic_ba(seed=7, noise_px=0.0)
        cams_s, pts_s, _ = global_bundle_adjustment(prob, CAM, INV_SIGMA2,
                                                    n_iters=10, cg_iters=50)
        np.testing.assert_allclose(got["cams"], np.asarray(cams_s), atol=1e-4)
        np.testing.assert_allclose(got["pts"], np.asarray(pts_s), atol=1e-3)
        # and it actually solved the problem, not just agreed
        for c in range(2, len(cams_true)):
            np.testing.assert_allclose(got["cams"][c], cams_true[c], atol=1e-3)


    def test_four_process_grouped_agrees_with_single_device(self, tmp_path):
        """4 OS processes x 4 virtual devices = a 16-way mesh with Gloo
        TCP between processes, running the PRODUCTION grouped point-
        sharded solver (VERDICT r3 next #10: the harness is pre-scaled so
        real-pod validation is a one-command run when hardware appears)."""
        got = _run_workers(tmp_path, 4, "grouped")
        from orb_slam2_detailed_comments_tpu.optim.global_ba import (
            global_bundle_adjustment,
        )
        prob, cams_true, pts_true = build_synthetic_ba(seed=7, noise_px=0.0)
        cams_s, pts_s, _ = global_bundle_adjustment(prob, CAM, INV_SIGMA2,
                                                    n_iters=10, cg_iters=50)
        np.testing.assert_allclose(got["cams"], np.asarray(cams_s), atol=2e-3)
        np.testing.assert_allclose(got["pts"], np.asarray(pts_s), atol=1e-2)
        for c in range(2, len(cams_true)):
            np.testing.assert_allclose(got["cams"][c], cams_true[c], atol=2e-3)
