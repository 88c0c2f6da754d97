from abcsmc_tpu.models.parameters import (
    Parameter,
    GaussianPrior,
    ContinuousUniformPrior,
    DiscreteUniformPrior,
    PseudoParameter,
    PosteriorParameter,
    ParameterSet,
)
from abcsmc_tpu.models.metrics import Metric
from abcsmc_tpu.models.transforms import ParameterTransform

__all__ = [
    "Parameter",
    "GaussianPrior",
    "ContinuousUniformPrior",
    "DiscreteUniformPrior",
    "PseudoParameter",
    "PosteriorParameter",
    "ParameterSet",
    "Metric",
    "ParameterTransform",
]
