"""Probabilistic core (reference: ``odin/bay``)."""
from odin_tpu.bay import distributions
from odin_tpu.bay.distribution_alias import DistSpec, parse_distribution
from odin_tpu.bay.helpers import concat_distributions, kl_divergence
from odin_tpu.bay.layers import (
    DenseDeterministic,
    DistributionDense,
    MixtureDensityNetwork,
    MixtureMassNetwork,
    MVNDiagLatents,
    NormalLatents,
)
from odin_tpu.bay.random_variable import RVconf

from odin_tpu.bay import stochastic_initializers as initializers  # noqa: E402
from odin_tpu.bay import vi  # noqa: E402  (also exposes bay.mixed_membership)
from odin_tpu.bay import mixed_membership  # noqa: E402
