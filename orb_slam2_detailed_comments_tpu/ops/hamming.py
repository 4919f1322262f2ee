"""Hamming distance on 256-bit ORB descriptors.

Replaces ORBmatcher::DescriptorDistance (reference: src/ORBmatcher.cc:2073-2093,
the classic popcount bit-trick on 8 uint32 words) with two batched TPU paths:

 1. `popcount` path: XOR + jax.lax.population_count, reduced over words.
    Best for small candidate sets (VPU elementwise).
 2. `matmul` path: unpack descriptors to +-1 vectors and compute
    D = (256 - A B^T) / 2 on the MXU. A 2048x256 @ 256x2048 product is a
    single systolic-array pass — this is the speed-of-light path for
    all-pairs matching on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DESC_WORDS = 8            # 8 x uint32 = 256 bits
DESC_BITS = 256


def popcount(x):
    """Population count of an unsigned integer array."""
    return jax.lax.population_count(x)


def hamming_distance_pairs(a, b):
    """Elementwise Hamming distance between matched descriptor arrays.
    a, b: (..., 8) uint32 -> (...,) int32."""
    return jnp.sum(popcount(jnp.bitwise_xor(a, b)).astype(jnp.int32), axis=-1)


def unpack_bits_pm1(desc, dtype=jnp.float32):
    """(N, 8) uint32 -> (N, 256) in {-1, +1} (bit set -> +1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)  # (N, 8, 32)
    bits = bits.reshape(desc.shape[:-1] + (DESC_BITS,))
    return (2.0 * bits.astype(dtype) - 1.0)


def pack_bits(bits):
    """(N, 256) {0,1}-valued -> (N, 8) uint32 packed descriptors."""
    b = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (DESC_WORDS, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


def hamming_distance_matrix(a, b, method: str = "auto"):
    """All-pairs Hamming distances.

    Args:
      a: (N, 8) uint32 descriptors.
      b: (M, 8) uint32 descriptors.
      method: 'popcount' | 'matmul' | 'auto'.

    Returns:
      (N, M) int32 distance matrix in [0, 256].
    """
    n = a.shape[0]
    m = b.shape[0]
    if method == "auto":
        method = "matmul" if n * m >= 64 * 64 else "popcount"
    if method == "popcount":
        x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
        return jnp.sum(popcount(x).astype(jnp.int32), axis=-1)
    # MXU path: hamming = (256 - <a_pm1, b_pm1>) / 2. The +-1 dot products
    # are integers in [-256, 256]; f32 accumulation is exact.
    av = unpack_bits_pm1(a)
    bv = unpack_bits_pm1(b)
    dot = jax.lax.dot_general(
        av, bv, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return ((DESC_BITS - dot) * 0.5).astype(jnp.int32)
