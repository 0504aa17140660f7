"""Target zoo: the models used by the reference's tests and the driver's
baseline configs (BASELINE.md): MVN, correlated Gaussian, Neal's funnel,
banana, gdemo, hierarchical logistic regression.
"""

from .gaussian import correlated_gaussian, mvn_diag, std_gaussian
from .funnel import funnel_nc_to_centered, neal_funnel, neal_funnel_nc
from .banana import banana
from .eight_schools import eight_schools
from .gdemo import GDEMO_MEAN, gdemo
from .logistic import (german_credit_logistic, hierarchical_logistic,
                       hierarchical_logistic_nc)
from .mixtures import gaussian_mixture, two_gaussian_mixtures_2d
from .spiral import spiral
from . import dists
from .dists import gdemo_declarative, joint_target, target_of

__all__ = [
    "std_gaussian",
    "mvn_diag",
    "correlated_gaussian",
    "neal_funnel",
    "neal_funnel_nc",
    "funnel_nc_to_centered",
    "banana",
    "gdemo",
    "eight_schools",
    "GDEMO_MEAN",
    "hierarchical_logistic",
    "hierarchical_logistic_nc",
    "german_credit_logistic",
    "gaussian_mixture",
    "two_gaussian_mixtures_2d",
    "spiral",
    "dists",
    "target_of",
    "joint_target",
    "gdemo_declarative",
]
