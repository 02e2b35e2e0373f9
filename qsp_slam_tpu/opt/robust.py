"""Robust kernels as IRLS weights + chi-square gating thresholds.

Parity: g2o's Huber kernel usage in the reference BA
(`src/Optimizer.cc:244-456` delta = sqrt(5.991)/sqrt(7.815);
`src/Optimizer_util.cc:446-450` object edges delta = sqrt(0.1*1e3)) and the
Python GN Huber weights (`reconstruct/loss_utils.py:236-265`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 95% chi-square quantiles used by ORB-SLAM-class systems for outlier gating.
CHI2_MONO = 5.991  # 2 dof
CHI2_STEREO = 7.815  # 3 dof


def huber_weight(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """IRLS weight for the Huber kernel as a function of squared error.

    rho(s) = s                   for s <= delta^2
           = 2 delta sqrt(s) - delta^2 otherwise
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s_safe = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / s_safe))


def huber_rho(chi2: jax.Array, delta2: jax.Array) -> jax.Array:
    """Huber robust cost of the squared error."""
    delta = jnp.sqrt(delta2)
    s = jnp.maximum(chi2, 0.0)
    return jnp.where(s <= delta2, s, 2.0 * delta * jnp.sqrt(s) - delta2)
