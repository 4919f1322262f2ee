"""Image pyramid + Gaussian blur.

Replaces ORBextractor::ComputePyramid (reference: src/ORBextractor.cc:2093-2168)
and the 7x7 sigma=2 GaussianBlur applied before descriptor sampling
(reference: src/ORBextractor.cc:2023). TPU-first: every level is computed
with XLA conv/resize ops; all shapes are static per (H, W, n_levels).
"""
from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gauss_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return k.astype(np.float32)


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur of a (H, W) float32 image (reflect padding,
    matching cv::GaussianBlur's BORDER_REFLECT_101 default).

    Implemented as weighted shifted adds rather than conv_general_dilated:
    a single-channel 1x7 convolution cannot use the MXU, and on TPU the
    conv path costs ~18ms/frame vs <1ms for the fused VPU form."""
    k = _gauss_kernel_1d(ksize, sigma)
    r = ksize // 2
    H, W = img.shape
    x = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    # horizontal pass
    h = k[0] * x[:, 0:W]
    for i in range(1, ksize):
        h = h + k[i] * x[:, i:i + W]
    # vertical pass
    v = k[0] * h[0:H, :]
    for i in range(1, ksize):
        v = v + k[i] * h[i:i + H, :]
    return v


@functools.lru_cache(maxsize=None)
def pyramid_shapes(height: int, width: int, n_levels: int, scale_factor: float) -> Tuple[Tuple[int, int], ...]:
    """Static per-level (H, W), scale = scale_factor**level (reference:
    ORBextractor.cc:2105-2109 rounds the scaled size)."""
    shapes = []
    for lv in range(n_levels):
        inv = 1.0 / (scale_factor ** lv)
        shapes.append((int(round(height * inv)), int(round(width * inv))))
    return tuple(shapes)


def _resize_bilinear(img, out_hw):
    return jax.image.resize(img, out_hw, method="linear")


@functools.lru_cache(maxsize=None)
def _composed_resize_mats(height: int, width: int, n_levels: int,
                          scale_factor: float):
    """Per-level row/column resize matrices composed across the level chain.

    jax.image.resize(method="linear") is a separable LINEAR map, i.e.
    resize(x) = A @ x @ B.T with per-axis weight matrices. The level-(k-1)
    -> level-k chain therefore composes into level-k = Acum_k @ img @
    Bcum_k.T with Acum_k = A_k @ ... @ A_1 — the same anti-aliasing
    accumulation as the sequential chain (reference resizes level-to-level,
    ORBextractor.cc:2130) but with every level computable directly from
    level 0 as one independent MXU matmul pair instead of a serial
    dependency chain of 7 small resizes.

    The single-axis matrices are extracted by resizing identity matrices
    (the untouched axis has scale 1 -> identity weights) on the host CPU
    backend, and the compositions are accumulated in float64 so the only
    rounding vs the sequential f32 chain is the final f32 cast.
    """
    shapes = pyramid_shapes(height, width, n_levels, scale_factor)
    cpu = jax.devices("cpu")[0]
    rows, cols = [], []
    acum = np.eye(height, dtype=np.float64)
    bcum = np.eye(width, dtype=np.float64)
    # ensure_compile_time_eval: this may be first reached while tracing
    # extract_orb; the weight extraction must run eagerly (on host CPU).
    with jax.ensure_compile_time_eval(), jax.default_device(cpu):
        for lv in range(1, n_levels):
            h_in, w_in = shapes[lv - 1]
            h_out, w_out = shapes[lv]
            # f32 identities: the sequential chain computes its weights at
            # the image dtype anyway; the composition accumulates in f64.
            A = np.asarray(jax.image.resize(
                jnp.eye(h_in, dtype=jnp.float32), (h_out, h_in), "linear"),
                np.float64)
            B = np.asarray(jax.image.resize(
                jnp.eye(w_in, dtype=jnp.float32), (w_out, w_in), "linear"),
                np.float64)
            acum = A @ acum
            bcum = B @ bcum
            rows.append(acum.astype(np.float32))
            cols.append(bcum.astype(np.float32))
    return tuple(rows), tuple(cols)


def build_pyramid(img, n_levels: int = 8, scale_factor: float = 1.2) -> List[jnp.ndarray]:
    """Build the scale pyramid of a (H, W) float32 image.

    The reference resizes level-to-level with INTER_LINEAR
    (ORBextractor.cc:2130). We keep the same level-to-level anti-aliasing
    accumulation but evaluate it as composed per-level resize matrices
    (see _composed_resize_mats) — all levels issue in parallel from level 0.
    ORB_PYRAMID_COMPOSED=0 restores the sequential resize chain.
    """
    import os
    composed = os.environ.get("ORB_PYRAMID_COMPOSED", "1") not in ("0", "false")
    shapes = pyramid_shapes(img.shape[0], img.shape[1], n_levels, scale_factor)
    if not composed:
        levels = [img]
        for lv in range(1, n_levels):
            levels.append(_resize_bilinear(levels[-1], shapes[lv]))
        return levels
    rows, cols = _composed_resize_mats(
        img.shape[0], img.shape[1], n_levels, scale_factor)
    levels = [img]
    for lv in range(1, n_levels):
        A = jnp.asarray(rows[lv - 1])
        B = jnp.asarray(cols[lv - 1])
        levels.append((A @ img) @ B.T)
    return levels


def level_scales(n_levels: int = 8, scale_factor: float = 1.2):
    """(scale, inv_scale, sigma2, inv_sigma2) per level as np arrays
    (reference: ORBextractor.cc constructor :784-806)."""
    s = np.array([scale_factor ** i for i in range(n_levels)], dtype=np.float32)
    return s, 1.0 / s, s * s, 1.0 / (s * s)


def features_per_level(n_features: int, n_levels: int = 8, scale_factor: float = 1.2) -> np.ndarray:
    """Geometric feature budget per level (reference: ORBextractor.cc:826-845
    — desired features scale by 1/scaleFactor per level, remainder to the
    last level)."""
    factor = 1.0 / scale_factor
    n_desired = n_features * (1 - factor) / (1 - factor ** n_levels)
    counts = []
    total = 0
    for lv in range(n_levels - 1):
        c = int(round(n_desired))
        counts.append(c)
        total += c
        n_desired *= factor
    counts.append(max(n_features - total, 0))
    return np.asarray(counts, dtype=np.int32)
