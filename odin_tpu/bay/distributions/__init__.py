"""In-repo distribution library (replaces TFP in the reference's ``odin/bay``)."""
from odin_tpu.bay.distributions.base import (
    Distribution,
    Independent,
    exact_kl,
    kl_registry_lookup,
    register_kl,
)
from odin_tpu.bay.distributions.continuous import (
    Beta,
    Dirichlet,
    Gamma,
    Laplace,
    LogNormal,
    Logistic,
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    Normal,
    NormalGamma,
    LogUniform,
    Uniform,
)
from odin_tpu.bay.distributions.conditional import ConditionalTensor
from odin_tpu.bay.distributions.deterministic import (
    Batchwise,
    Deterministic,
    VectorDeterministic,
)
from odin_tpu.bay.distributions.discrete import (
    Bernoulli,
    Binomial,
    Categorical,
    ContinuousBernoulli,
    DirichletMultinomial,
    Multinomial,
    NegativeBinomial,
    NegativeBinomialDisp,
    OneHotCategorical,
    Poisson,
    RelaxedBernoulli,
    RelaxedOneHotCategorical,
    ZeroInflated,
)
from odin_tpu.bay.distributions.mixture import GaussianMixture, MixtureSameFamily
from odin_tpu.bay.distributions.quantized import (
    MixtureQuantizedLogistic,
    Quantized,
    QuantizedLogistic,
    qNormal,
    qUniform,
)
from odin_tpu.bay.distributions.spherical import (
    PowerSpherical,
    SphericalUniform,
    VonMisesFisher,
)
from odin_tpu.bay.distributions.vector_quantizer import VectorQuantized
