from .fixed_point import sfd, boostconv_dns, tdf
from .newton import newton_krylov, NewtonResult
from .stability import (
    linear_stability_analysis,
    transient_growth_analysis,
    resolvent_analysis,
    StabilityResult,
)

__all__ = [
    "sfd",
    "boostconv_dns",
    "tdf",
    "newton_krylov",
    "NewtonResult",
    "linear_stability_analysis",
    "transient_growth_analysis",
    "resolvent_analysis",
    "StabilityResult",
]
