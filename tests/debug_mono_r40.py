"""Debug driver for the mono radius-40 (narrow FOV + large depth) failure.

Reproduces the KITTI-class mono config in the failing regime at reduced
pixel count (same angular geometry: fx/width ratio ~1.09 -> half-FOV ~25
deg) with per-frame diagnostics. Not a test.

Usage: python tests/debug_mono_r40.py [n_frames] [radius] [fx_over_w]
"""
import sys
import numpy as np

sys.path.insert(0, "tests")
import conftest  # noqa: F401  (forces CPU platform)

from orb_slam2_detailed_comments_tpu.evaluation.ate import ate_rmse
from orb_slam2_detailed_comments_tpu.frontend.tracking import (
    Tracker, TrackingState, Sensor)
from orb_slam2_detailed_comments_tpu.geometry.camera import PinholeCamera
from orb_slam2_detailed_comments_tpu.system import System
from orb_slam2_detailed_comments_tpu.utils.config import SlamConfig, OrbConfig

from synthetic_world import CylinderWorld, loop_trajectory

import orb_slam2_detailed_comments_tpu.solvers.initializer as ini
import orb_slam2_detailed_comments_tpu.frontend.tracking as trk


def instrument_initializer():
    orig = ini.initialize_two_view

    def wrapped(uv1, uv2, valid, K, seed=0, **kw):
        import jax.numpy as jnp
        n_valid = int(np.asarray(valid).sum())
        res = orig(uv1, uv2, valid, K, seed=seed, **kw)
        # re-run internals for diagnostics
        rng = np.random.default_rng(seed)
        vidx = np.nonzero(np.asarray(valid))[0]
        samples = np.stack([rng.choice(vidx, 8, replace=False)
                            for _ in range(ini.N_RANSAC)])
        (H21, SH, h_in), (F21, SF, f_in) = ini._ransac_models(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid),
            jnp.asarray(samples, np.int32))
        SH, SF = float(SH), float(SF)
        RH = SH / max(SH + SF, 1e-9)
        K_np = np.asarray(K, np.float64)
        if RH > 0.40:
            hyps = ini._decompose_homography(np.asarray(H21, np.float64), K_np)
            inl = h_in
        else:
            hyps = ini._decompose_essential(np.asarray(F21, np.float64), K_np)
            inl = f_in
        n_inl = int(np.asarray(inl).sum())
        line = f"  [init] matches={n_valid} RH={RH:.3f} n_inl={n_inl}"
        if hyps:
            Rs = jnp.asarray(np.stack([h[0] for h in hyps]), jnp.float32)
            ts = jnp.asarray(np.stack([h[1] for h in hyps]), jnp.float32)
            ngood, parallax, pts, good = ini._check_rt_batch(
                Rs, ts, jnp.asarray(uv1), jnp.asarray(uv2), inl,
                jnp.asarray(K_np, jnp.float32), 4.0)
            ngood = np.asarray(ngood); parallax = np.asarray(parallax)
            b = int(np.argmax(ngood))
            nsim = int(np.sum(ngood > 0.7 * ngood[b]))
            line += (f" maxgood={ngood[b]} (0.9N={0.9*n_inl:.0f})"
                     f" par50={parallax[b]:.2f}deg nsim={nsim}")
        print(line + f" -> {'ACCEPT' if res is not None else 'reject'}",
              flush=True)
        return res

    ini.initialize_two_view = wrapped
    trk.initialize_two_view = wrapped


def main(n_frames=140, radius=40.0, fx_over_w=1.09, width=320, height=240,
         features=600, frames_scale=1.0):
    fx = fx_over_w * width
    # motion per frame matched to the committed runs (300-frame/2-lap
    # geometry): always build the full 300-frame trajectory and run the
    # first n_frames of it
    world = CylinderWorld(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                          width=width, height=height, radius=radius,
                          texture_seed=0)
    overlap = max(int(300 * 0.12 / 2.0), 12)
    poses = loop_trajectory(300, path_radius=0.5 * radius,
                            laps=2.0, overlap=overlap)[:n_frames]
    kp_cap = 1 << int(np.ceil(np.log2(features + 1)))
    cfg = SlamConfig(
        camera=PinholeCamera(fx=fx, fy=fx, cx=width / 2, cy=height / 2,
                             width=width, height=height),
        orb=OrbConfig(n_features=features, max_keypoints=kp_cap),
        fps=10.0, max_keyframes=512, max_map_points=100000)
    slam = System(cfg, Sensor.MONOCULAR, enable_loop_closing=False)
    instrument_initializer()
    tracker = slam.tracker

    est, gt, used = [], [], []
    for i in range(n_frames):
        img = world.render(poses[i])
        Tcw = slam.track_monocular(img, i * 0.1)
        fr = tracker.last_frame
        n_mp = int((fr.mp >= 0).sum()) if fr is not None and fr.mp is not None else 0
        mpv = slam.map.mp_valid.sum()
        print(f"f{i:3d} {tracker.state.name:15s} kps={fr.n_valid if fr else 0:4d} "
              f"matched={n_mp:4d} kfs={slam.map.n_keyframes():3d} "
              f"mps={int(mpv):5d}", flush=True)
        if Tcw is not None and tracker.state == TrackingState.OK:
            est.append(np.linalg.inv(Tcw)[:3, 3])
            gt.append(-poses[i, :3, :3].T @ poses[i, :3, 3])
            used.append(i)
            if len(est) >= 2:
                de = np.linalg.norm(est[-1] - est[-2])
                dg = np.linalg.norm(gt[-1] - gt[-2])
                print(f"    step: est={de:.5f} gt={dg:.3f} "
                      f"est/gt={de/max(dg,1e-9):.5f}", flush=True)
    if len(est) >= 3:
        print("frames tracked:", len(est), "/", n_frames)
        print("ATE (scale-aligned):",
              ate_rmse(np.asarray(est), np.asarray(gt), with_scale=True))
    # keyframe pose quality vs GT (similarity-aligned): how well did
    # local BA iron out the per-frame valley jitter?
    ms = slam.map
    kfs = ms.keyframe_ids()
    if kfs.size >= 4:
        from orb_slam2_detailed_comments_tpu.evaluation.ate import align_umeyama
        fid = ms.kf_frame_id[kfs]
        C_est = np.stack([ms.kf_camera_center(int(k)) for k in kfs])
        C_gt = np.stack([-poses[f, :3, :3].T @ poses[f, :3, 3] for f in fid])
        sc, R, t = align_umeyama(C_est, C_gt, True)
        C_al = sc * C_est @ R.T + t
        err = np.linalg.norm(C_al - C_gt, axis=-1)
        step = np.linalg.norm(np.diff(C_gt, axis=0), axis=-1).mean()
        print(f"KF center err after sim align: med={np.median(err):.3f} m "
              f"max={err.max():.3f} m (gt inter-KF step {step:.3f} m)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 140
    r = float(sys.argv[2]) if len(sys.argv) > 2 else 40.0
    fw = float(sys.argv[3]) if len(sys.argv) > 3 else 1.09
    main(n, r, fw)
