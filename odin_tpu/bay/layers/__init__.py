from odin_tpu.bay.layers.dense_distribution import (
    DenseDeterministic,
    DistributionDense,
    MixtureDensityNetwork,
    MixtureMassNetwork,
    MixtureMVNDiagLatents,
    MixtureNormalLatents,
    MVNDiagLatents,
    NormalLatents,
)
from odin_tpu.bay.layers.distribution_layers import *  # noqa: F401,F403
from odin_tpu.bay.layers.util_layers import (
    ConditionalTensorLayer,
    DistributionAttr,
    Moments,
    Sampling,
    Stddev,
)
