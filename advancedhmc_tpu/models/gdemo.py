"""The gdemo conjugate model (≅ /root/reference/test/common.jl:91-110).

s ~ InverseGamma(2, 3); m | s ~ N(0, s); observations 1.5, 2.0 ~ N(m, s).
Unconstrained parameterisation θ = (log s, m) with log-Jacobian, exactly as
the reference's Bijectors transform. Analytic posterior mean of (s, m) is
(49/24, 7/6) (/root/reference/test/common.jl:104-106).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..target import LogDensityTarget

GDEMO_MEAN = (49.0 / 24.0, 7.0 / 6.0)  # posterior mean of (s, m)

_OBS = (1.5, 2.0)
_ALPHA, _BETA = 2.0, 3.0


def gdemo() -> LogDensityTarget:
    def logdensity(theta):
        z, m = theta[0], theta[1]
        s = jnp.exp(z)
        # InverseGamma(α, β) log pdf + log|ds/dz| = z
        lp = (
            _ALPHA * jnp.log(_BETA)
            - gammaln(_ALPHA)
            - (_ALPHA + 1) * jnp.log(s)
            - _BETA / s
            + z
        )
        # m | s ~ N(0, s) (variance s)
        lp = lp - 0.5 * (jnp.log(2 * jnp.pi * s) + jnp.square(m) / s)
        for x in _OBS:
            lp = lp - 0.5 * (jnp.log(2 * jnp.pi * s) + jnp.square(x - m) / s)
        return lp

    return LogDensityTarget(logdensity, 2)


def constrain(theta):
    """Map unconstrained draws (log s, m) → (s, m)."""
    return jnp.stack([jnp.exp(theta[..., 0]), theta[..., 1]], axis=-1)
