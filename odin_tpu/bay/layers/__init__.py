from odin_tpu.bay.layers.dense_distribution import (
    DenseDeterministic,
    DistributionDense,
    MixtureDensityNetwork,
    MixtureMassNetwork,
    MVNDiagLatents,
    NormalLatents,
)
