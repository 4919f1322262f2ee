import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_detailed_comments_tpu.ops.fast import fast_score_map, nms_3x3
from orb_slam2_detailed_comments_tpu.ops.hamming import (
    hamming_distance_matrix, hamming_distance_pairs, pack_bits, unpack_bits_pm1,
)
from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb
from orb_slam2_detailed_comments_tpu.ops.pyramid import build_pyramid, features_per_level
from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig


def checkerboard(h=240, w=320, sq=24):
    ys, xs = np.mgrid[0:h, 0:w]
    img = (((ys // sq) + (xs // sq)) % 2) * 200.0 + 30.0
    return img.astype(np.float32)


def textured_image(h=240, w=320, seed=0, n_blobs=120):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 40.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        s = rng.integers(3, 9)
        img[y:y + s, x:x + s] = rng.uniform(90, 250)
    return img


class TestFast:
    def test_detects_square_corners(self):
        img = np.full((64, 64), 50.0, np.float32)
        img[20:44, 20:44] = 200.0
        score = nms_3x3(fast_score_map(jnp.asarray(img), 20.0))
        s = np.asarray(score)
        ys, xs = np.nonzero(s)
        assert len(ys) >= 4
        # all detections should be near the 4 corners of the square
        corners = np.array([[20, 20], [20, 43], [43, 20], [43, 43]])
        for y, x in zip(ys, xs):
            d = np.min(np.linalg.norm(corners - np.array([y, x]), axis=1))
            assert d < 4.0, (y, x)

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        score = fast_score_map(img, 7.0)
        assert float(jnp.sum(score > 0)) == 0

    def test_nms_keeps_single_peak(self):
        s = np.zeros((32, 32), np.float32)
        s[10, 10] = 5.0
        s[10, 11] = 4.0
        out = np.asarray(nms_3x3(jnp.asarray(s)))
        assert out[10, 10] == 5.0
        assert out[10, 11] == 0.0


class TestHamming:
    def test_matmul_equals_popcount(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2**32, (65, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (130, 8), dtype=np.uint32))
        d1 = hamming_distance_matrix(a, b, method="popcount")
        d2 = hamming_distance_matrix(a, b, method="matmul")
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_identity_zero(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32))
        d = hamming_distance_pairs(a, a)
        np.testing.assert_array_equal(np.asarray(d), 0)

    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(3)
        desc = jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint32))
        pm1 = unpack_bits_pm1(desc)
        bits = (pm1 > 0).astype(jnp.uint32)
        desc2 = pack_bits(bits)
        np.testing.assert_array_equal(np.asarray(desc2), np.asarray(desc))


class TestPyramid:
    def test_level_budgets_sum(self):
        b = features_per_level(1000, 8, 1.2)
        assert b.sum() == 1000
        assert (b[:-1][1:] <= b[:-1][:-1]).all()  # decreasing

    def test_pyramid_shapes(self):
        img = jnp.asarray(checkerboard())
        lv = build_pyramid(img, 8, 1.2)
        assert len(lv) == 8
        assert lv[0].shape == (240, 320)
        assert lv[1].shape == (int(round(240 / 1.2)), int(round(320 / 1.2)))


class TestPyramidComposed:
    def test_composed_matches_sequential_chain(self, monkeypatch):
        """ORB_PYRAMID_COMPOSED=1 (default) evaluates each level as one
        composed resize matrix from level 0 instead of the sequential
        level-to-level chain; the composition is exact linear algebra, so
        every level must agree with the chain to float tolerance (ADVICE
        round 1: a bug in matrix extraction/composition would otherwise go
        undetected — shapes-only tests can't see it)."""
        img = jnp.asarray(textured_image(h=120, w=160, seed=3))
        monkeypatch.setenv("ORB_PYRAMID_COMPOSED", "0")
        seq = build_pyramid(img)
        monkeypatch.setenv("ORB_PYRAMID_COMPOSED", "1")
        comp = build_pyramid(img)
        assert len(seq) == len(comp)
        for lv, (a, b) in enumerate(zip(seq, comp)):
            assert a.shape == b.shape
            dev = float(jnp.max(jnp.abs(a - b)))
            assert dev < 1e-2, f"level {lv}: composed vs sequential max dev {dev}"


class TestExtractor:
    CFG = OrbConfig(n_features=500, max_keypoints=1024)

    def test_extract_basic(self):
        img = jnp.asarray(textured_image())
        kp = extract_orb(img, self.CFG)
        v = np.asarray(kp.valid)
        assert v.sum() > 200, f"only {v.sum()} keypoints"
        xy = np.asarray(kp.xy)[v]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 240).all()
        # descriptors should be non-trivial
        desc = np.asarray(kp.desc)[v]
        assert (desc.sum(axis=1) > 0).all()
        oct_ = np.asarray(kp.octave)[v]
        assert oct_.min() == 0 and oct_.max() < 8

    def test_spatial_coverage(self):
        # blobs spread over the image -> keypoints should cover all quadrants
        img = jnp.asarray(textured_image(seed=5))
        kp = extract_orb(img, self.CFG)
        v = np.asarray(kp.valid)
        xy = np.asarray(kp.xy)[v]
        for qx in (0, 1):
            for qy in (0, 1):
                cnt = np.sum((xy[:, 0] >= qx * 160) & (xy[:, 0] < (qx + 1) * 160)
                             & (xy[:, 1] >= qy * 120) & (xy[:, 1] < (qy + 1) * 120))
                assert cnt > 20, f"quadrant {qx},{qy} has {cnt} keypoints"

    def test_descriptor_repeatability_translation(self):
        # same content shifted by 8px -> matched descriptors should be close
        base = textured_image(seed=7)
        img1 = base[:-8, :-8]
        img2 = base[8:, 8:]
        kp1 = extract_orb(jnp.asarray(img1), self.CFG)
        kp2 = extract_orb(jnp.asarray(img2), self.CFG)
        v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
        xy1 = np.asarray(kp1.xy)[v1]
        xy2 = np.asarray(kp2.xy)[v2] + 8.0  # img2 coords shifted back
        d1 = np.asarray(kp1.desc)[v1]
        d2 = np.asarray(kp2.desc)[v2]
        o1 = np.asarray(kp1.octave)[v1]
        o2 = np.asarray(kp2.octave)[v2]
        # nearest spatial neighbors restricted to the same octave (a
        # translated image re-detects the same corner at the same level;
        # cross-level pairs legitimately have unrelated descriptors)
        dists = np.linalg.norm(xy1[:, None] - xy2[None, :], axis=-1)
        dists[o1[:, None] != o2[None, :]] = 1e9
        nn = dists.argmin(axis=1)
        spatial_ok = dists[np.arange(len(nn)), nn] < 1.5
        assert spatial_ok.sum() > 50
        dh = np.asarray(hamming_distance_pairs(jnp.asarray(d1[spatial_ok]), jnp.asarray(d2[nn[spatial_ok]])))
        # matched descriptors far below random (128)
        assert np.median(dh) < 40, f"median hamming {np.median(dh)}"

    def test_rotation_invariance(self):
        pytest.importorskip("scipy")
        from scipy.ndimage import rotate
        base = textured_image(seed=9, n_blobs=140)
        ang = 30.0
        rot = rotate(base, ang, reshape=False, order=1, mode="nearest").astype(np.float32)
        kp1 = extract_orb(jnp.asarray(base), self.CFG)
        kp2 = extract_orb(jnp.asarray(rot), self.CFG)
        v1, v2 = np.asarray(kp1.valid), np.asarray(kp2.valid)
        xy1 = np.asarray(kp1.xy)[v1]
        d1 = np.asarray(kp1.desc)[v1]
        o1 = np.asarray(kp1.octave)[v1]
        xy2 = np.asarray(kp2.xy)[v2]
        d2 = np.asarray(kp2.desc)[v2]
        o2 = np.asarray(kp2.octave)[v2]
        # map kp1 into rotated-image coords (scipy rotate convention) and
        # pair same-octave nearest neighbors
        c = np.array([320 / 2 - 0.5, 240 / 2 - 0.5])
        th = np.deg2rad(ang)
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        xy1r = (xy1 - c) @ R + c
        dists = np.linalg.norm(xy1r[:, None] - xy2[None, :], axis=-1)
        dists[o1[:, None] != o2[None, :]] = 1e9
        nn = dists.argmin(axis=1)
        ok = dists[np.arange(len(nn)), nn] < 2.0
        assert ok.sum() > 20
        dh = np.asarray(hamming_distance_pairs(jnp.asarray(d1[ok]), jnp.asarray(d2[nn[ok]])))
        assert np.median(dh) < 64, f"median hamming under rotation {np.median(dh)}"


class TestPallasFast:
    def test_matches_xla_path(self):
        """The fused Pallas FAST+NMS kernel (experimental; interpret mode on
        CPU) must agree with the XLA formulation away from the border."""
        import jax
        from orb_slam2_detailed_comments_tpu.ops.pallas_fast import fast_score_nms_pallas
        img = jnp.asarray(textured_image(h=120, w=160, seed=3))
        ref = np.asarray(nms_3x3(fast_score_map(img, 7.0)))
        out = np.asarray(fast_score_nms_pallas(img, 7.0,
                                               interpret=jax.default_backend() == "cpu"))
        d = np.abs(ref - out)[4:-4, 4:-4]
        assert d.max() < 1e-4

    def test_pyramid_kernel_matches_xla(self):
        """The single-dispatch whole-pyramid kernel (tile-metadata grid) must
        reproduce the XLA NMS/raw/blur maps bit-(near-)exactly per level."""
        import jax
        from orb_slam2_detailed_comments_tpu.ops.pallas_fast import fast_pyramid_pallas
        from orb_slam2_detailed_comments_tpu.ops.fast import fast_score_dense
        from orb_slam2_detailed_comments_tpu.ops.pyramid import (
            build_pyramid, pyramid_shapes, gaussian_blur)
        img = jnp.asarray(textured_image(h=240, w=320, seed=5))
        levels = build_pyramid(img, 4, 1.2)
        shapes = pyramid_shapes(240, 320, 4, 1.2)
        nms_l, raw_l, blur_l = fast_pyramid_pallas(
            tuple(levels), shapes, 7.0,
            interpret=jax.default_backend() == "cpu")
        for lv in range(4):
            limg = levels[lv]
            assert np.abs(np.asarray(nms_l[lv]) -
                          np.asarray(nms_3x3(fast_score_map(limg, 7.0)))).max() == 0.0
            assert np.abs(np.asarray(raw_l[lv]) -
                          np.asarray(fast_score_dense(limg)))[4:-4, 4:-4].max() == 0.0
            assert np.abs(np.asarray(blur_l[lv]) -
                          np.asarray(gaussian_blur(limg))).max() < 1e-3


class TestPallasFastRollVariant:
    def test_roll_pyramid_kernel_matches_xla(self):
        """Round-4 roll-based rewrite (aligned writes only — the
        compile-time fix candidate for 1241x376) must match the XLA maps
        exactly like the slice-based kernel does."""
        import jax
        from orb_slam2_detailed_comments_tpu.ops.pallas_fast import (
            fast_pyramid_pallas_roll)
        from orb_slam2_detailed_comments_tpu.ops.fast import fast_score_dense
        from orb_slam2_detailed_comments_tpu.ops.pyramid import (
            build_pyramid, pyramid_shapes, gaussian_blur)
        img = jnp.asarray(textured_image(h=240, w=320, seed=5))
        levels = build_pyramid(img, 4, 1.2)
        shapes = pyramid_shapes(240, 320, 4, 1.2)
        nms_l, raw_l, blur_l = fast_pyramid_pallas_roll(
            tuple(levels), shapes, 7.0,
            interpret=jax.default_backend() == "cpu")
        for lv in range(4):
            limg = levels[lv]
            assert np.abs(np.asarray(nms_l[lv]) -
                          np.asarray(nms_3x3(fast_score_map(limg, 7.0)))).max() == 0.0
            assert np.abs(np.asarray(raw_l[lv]) -
                          np.asarray(fast_score_dense(limg)))[4:-4, 4:-4].max() == 0.0
            assert np.abs(np.asarray(blur_l[lv]) -
                          np.asarray(gaussian_blur(limg))).max() < 1e-3


class TestBatchedPallasFastMaps:
    def test_batched_extract_matches_default_path(self, monkeypatch):
        """extract_orb_batch with ORB_FAST_PALLAS=roll (the TPU default
        since round 4) hoists ONE whole-batch map kernel out of the vmap.
        The kernel modes are now static jit args resolved per call
        (round-5 ADVICE fix), so the two calls below genuinely trace both
        paths — previously the second call hit the first call's jit cache
        and this test compared the XLA path to itself. The roll kernel's
        score maps agree with the XLA maps only to float-eps (different
        summation order), so selection/octave/validity must match exactly
        while xy/response/angle carry an eps tolerance and descriptors may
        flip isolated near-tie bits."""
        from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb_batch
        from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig
        imgs = jnp.stack([jnp.asarray(textured_image(h=120, w=160, seed=s_))
                          for s_ in (1, 2)])
        cfg = OrbConfig(n_features=150, max_keypoints=256, n_levels=3)
        monkeypatch.setenv("ORB_FAST_PALLAS", "0")
        ref = extract_orb_batch(imgs, cfg)
        monkeypatch.setenv("ORB_FAST_PALLAS", "roll")
        out = extract_orb_batch(imgs, cfg)
        np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
        np.testing.assert_array_equal(np.asarray(ref.octave), np.asarray(out.octave))
        v = np.asarray(ref.valid)
        same = (np.abs(np.asarray(ref.xy) - np.asarray(out.xy)).max(-1) < 1e-3) & v
        # score ties between cells can legitimately swap a few selections
        # between the paths; demand near-total row agreement
        assert same.sum() >= 0.95 * v.sum(), (
            f"only {same.sum()}/{v.sum()} keypoints agree")
        np.testing.assert_allclose(np.asarray(ref.response)[same],
                                   np.asarray(out.response)[same], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ref.angle)[same],
                                   np.asarray(out.angle)[same], atol=1e-3)
        # descriptor bits flip only on float-eps ties; a near-tie ANGLE
        # that crosses an offset-rounding boundary can flip several bits
        # on one keypoint, so gate the distribution, not the max
        ham = np.bitwise_count(np.bitwise_xor(
            np.asarray(ref.desc)[same], np.asarray(out.desc)[same])).sum(-1)
        assert ham.mean() < 1.5, f"mean descriptor hamming {ham.mean():.2f}"
        assert (ham == 0).mean() >= 0.6, f"{(ham == 0).mean():.2%} identical"
        assert (ham <= 4).mean() >= 0.95, f"{(ham <= 4).mean():.2%} within 4 bits"


class TestOnehotDescriptorPath:
    def test_onehot_matches_gather_path(self, monkeypatch):
        """ORB_DESC_ONEHOT=1 replaces the per-keypoint 512-point patch
        gather with a one-hot row/column MXU contraction sampling the f32
        blur via a 2-limb bfloat16 split (error ~1e-3 gray). BRIEF bits
        may flip only on near-exact intensity ties: descriptors must agree
        within 2/256 bits, angles exactly (angles use the raw image, not
        the limb-split path). (An earlier 1-pass variant quantized the
        blur to integers for bf16 exactness — bisected as the cause of a
        long-run drift regression, see ops/orb.py precision note.)"""
        from orb_slam2_detailed_comments_tpu.ops.orb import (
            _fused_level_angles_descriptors)
        from orb_slam2_detailed_comments_tpu.ops.pyramid import gaussian_blur

        img = jnp.asarray(textured_image(h=120, w=160, seed=11))
        blurred = gaussian_blur(img)
        rng = np.random.default_rng(0)
        xy = np.stack([rng.integers(0, 160, 64), rng.integers(0, 120, 64)],
                      axis=-1).astype(np.int32)
        valid = np.ones(64, bool)

        monkeypatch.setenv("ORB_DESC_ONEHOT", "0")  # force the gather path
        ang0, desc0 = _fused_level_angles_descriptors(
            img, blurred, jnp.asarray(xy), jnp.asarray(valid))
        monkeypatch.setenv("ORB_DESC_ONEHOT", "1")
        ang1, desc1 = _fused_level_angles_descriptors(
            img, blurred, jnp.asarray(xy), jnp.asarray(valid))

        d0 = np.asarray(desc0)
        d1 = np.asarray(desc1)
        ham = np.bitwise_count(np.bitwise_xor(d0, d1)).sum(-1)
        assert ham.max() <= 2, f"max hamming {ham.max()}"
        assert (ham == 0).mean() >= 0.9, f"only {(ham == 0).mean():.2%} identical"
        assert np.allclose(np.asarray(ang0), np.asarray(ang1))


class TestBatchedExtraction:
    """extract_orb_batch (one L/R dispatch, reference: Frame.cc:158-164
    two-thread extraction) must agree elementwise with per-image calls."""

    def test_batch_matches_single(self):
        import jax.numpy as jnp
        from orb_slam2_detailed_comments_tpu.ops.orb import (
            extract_orb, extract_orb_batch)
        from orb_slam2_detailed_comments_tpu.utils.config import OrbConfig

        rng = np.random.default_rng(17)
        imgs = []
        for s in range(2):
            img = np.full((120, 160), 40.0, np.float32)
            ys = rng.integers(5, 110, 400)
            xs = rng.integers(5, 150, 400)
            for y, x in zip(ys, xs):
                img[y:y + 4, x:x + 4] = rng.uniform(60, 250)
            imgs.append(img)
        orb = OrbConfig(n_features=200, max_keypoints=256)
        batch = extract_orb_batch(jnp.asarray(np.stack(imgs)), orb)
        for b in range(2):
            single = extract_orb(jnp.asarray(imgs[b]), orb)
            valid = np.asarray(single.valid)
            np.testing.assert_array_equal(np.asarray(batch.valid[b]), valid)
            # vmap changes XLA fusion, which can flip float tie-breaks in
            # the sub-pixel quadratic fit (|den| ~ threshold): allow 0.5px
            # on isolated keypoints, demand near-total exact agreement.
            bx = np.asarray(batch.xy[b])[valid]
            sx = np.asarray(single.xy)[valid]
            np.testing.assert_allclose(bx, sx, atol=0.5)
            assert (np.abs(bx - sx).max(-1) < 1e-4).mean() > 0.95
            bd = np.asarray(batch.desc[b])[valid]
            sd = np.asarray(single.desc)[valid]
            assert (bd == sd).all(-1).mean() > 0.95
            ba = np.asarray(batch.angle[b])[valid]
            sa = np.asarray(single.angle)[valid]
            assert (np.abs(ba - sa) < 1e-3).mean() > 0.95


class TestPallasPatchGather:
    def test_matches_host_slicing(self):
        """The DMA patch-gather kernel (ops/pallas_patch.py) must move
        exactly the bytes the dynamic_slice path moves (interpret mode on
        CPU; the TPU path is the same kernel)."""
        from orb_slam2_detailed_comments_tpu.ops.pallas_patch import (
            patch_gather)
        rng = np.random.default_rng(11)
        img = jnp.asarray(rng.uniform(0, 255, (2, 150, 210)).astype(np.float32))
        xy = jnp.asarray(rng.integers(0, [210 - 39, 150 - 39],
                                      (29, 2)).astype(np.int32))
        out = np.asarray(patch_gather(img, xy, 39))
        ref = np.stack([np.asarray(img)[:, y:y + 39, x:x + 39]
                        for x, y in np.asarray(xy)])
        np.testing.assert_array_equal(out, ref)

    def test_extract_orb_batch_bit_identical(self, monkeypatch):
        """The stereo frontend vmaps extraction over the L/R pair, so the
        kernel must survive jax.vmap (pallas batching adds a grid dim).
        The TPU-default Pallas path must reproduce the XLA dynamic_slice
        path bit-for-bit through the full batched extractor."""
        import jax
        from orb_slam2_detailed_comments_tpu.ops.orb import extract_orb_batch
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.uniform(0, 255, (2, 120, 160)).astype(np.float32))
        cfg = OrbConfig(n_features=150, max_keypoints=256, n_levels=3)
        monkeypatch.setenv("ORB_PATCH_PALLAS", "1")
        jax.clear_caches()
        kp = extract_orb_batch(imgs, cfg)
        kp = jax.tree.map(np.asarray, kp)
        monkeypatch.setenv("ORB_PATCH_PALLAS", "0")
        jax.clear_caches()  # env var isn't part of the jit cache key
        kp0 = extract_orb_batch(imgs, cfg)
        for name in ("xy", "response", "octave", "angle", "desc", "valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(kp, name)),
                np.asarray(getattr(kp0, name)), err_msg=name)
