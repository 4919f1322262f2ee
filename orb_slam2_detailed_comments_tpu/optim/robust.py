"""Robust kernels for iteratively-reweighted least squares.

The reference uses g2o's RobustKernelHuber with delta = sqrt(5.991) for
monocular and sqrt(7.815) for stereo edges (reference: src/Optimizer.cc:462,
:508, :717, :748). In IRLS form the Huber kernel contributes weight
min(1, delta / |r|_Sigma) on the squared error.
"""
from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991    # 95% of chi2 with 2 dof (reference: Optimizer.cc:540)
CHI2_STEREO = 7.815  # 95% of chi2 with 3 dof (reference: Optimizer.cc:541)
DELTA_MONO = CHI2_MONO ** 0.5
DELTA_STEREO = CHI2_STEREO ** 0.5


def huber_weight(chi2, delta):
    """IRLS weight for the Huber kernel given chi2 = |r|_Sigma^2."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / e)
