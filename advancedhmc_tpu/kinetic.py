"""Kinetic energy configurations.

Mirrors `AbstractKinetic`/`GaussianKinetic` (/root/reference/src/AdvancedHMC.jl:49-53)
and the experimental `RelativisticKinetic`
(/root/reference/research/src/relativistic_hmc.jl:5-10). Configs are static
frozen dataclasses: the kinetic *kind* selects code paths at trace time.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class GaussianKinetic:
    """K(r) = ½ rᵀ M⁻¹ r — the default kinetic energy."""


@dataclasses.dataclass(frozen=True)
class RelativisticKinetic:
    """Relativistic kinetic energy K(r) = m c² sqrt(rᵀM⁻¹r/(m²c²) + 1).

    Mirrors /root/reference/research/src/relativistic_hmc.jl:5-10 (experimental
    tier). Supported with unit/diag metrics.
    """

    m: float
    c: float
