"""Named distribution-layer classes.

Reference: ``odin/bay/layers/{continuous,discrete,count_layers,
mixture_layers,deterministic_layers}.py`` expose one DistributionLambda
class per family (`GaussianLayer`, `BernoulliLayer`, `ZINegativeBinomial
Layer`, ...) that consumes RAW parameter tensors and emits the
distribution.  Here every named class is a thin fixed-posterior
`DistributionDense` with ``projection=False`` — same call surface
(params in, distribution out), one registry underneath
(``bay/distribution_alias.py``) instead of ~3.5k LoC of per-family layer
code.  Pass ``projection=True`` to prepend the Dense parameter projection.
"""
from __future__ import annotations

from odin_tpu.bay.layers.dense_distribution import DistributionDense

__all__ = [
    "GaussianLayer", "NormalLayer", "LogNormalLayer", "GammaLayer",
    "BetaLayer", "DirichletLayer", "MultivariateNormalLayer",
    "BernoulliLayer", "ContinuousBernoulliLayer", "ZIBernoulliLayer",
    "CategoricalLayer", "OneHotCategoricalLayer", "RelaxedBernoulliLayer",
    "RelaxedOneHotCategoricalLayer", "BinomialLayer", "MultinomialLayer",
    "DirichletMultinomialLayer", "PoissonLayer", "ZIPoissonLayer",
    "NegativeBinomialLayer", "NegativeBinomialDispLayer",
    "ZINegativeBinomialLayer", "ZINegativeBinomialDispLayer",
    "MixtureGaussianLayer", "MixtureNegativeBinomialLayer",
    "MixtureQLogisticLayer", "QuantizedLogisticLayer", "DeterministicLayer",
    "VectorDeterministicLayer", "VonMisesFisherLayer",
]

# name -> alias in the distribution registry (each cites its reference
# class; file:line refer to the reference layer definitions)
_LAYER_ALIASES = {
    "GaussianLayer": "gaussian",            # continuous.py:69
    "NormalLayer": "normal",
    "LogNormalLayer": "lognormal",          # continuous.py:150
    "GammaLayer": "gamma",                  # continuous.py:230
    "BetaLayer": "beta",                    # continuous.py:289
    "DirichletLayer": "dirichlet",          # continuous.py:344
    "MultivariateNormalLayer": "mvntril",   # continuous.py:402
    "BernoulliLayer": "bernoulli",          # discrete.py:26
    "ContinuousBernoulliLayer": "cbernoulli",
    "ZIBernoulliLayer": "zibernoulli",      # discrete.py:120
    "CategoricalLayer": "categorical",      # discrete.py:180
    "OneHotCategoricalLayer": "onehot",     # discrete.py:230
    "RelaxedBernoulliLayer": "relaxedbernoulli",
    "RelaxedOneHotCategoricalLayer": "relaxedonehot",  # discrete.py:300
    "BinomialLayer": "binomial",            # count_layers.py:75
    "MultinomialLayer": "multinomial",
    "DirichletMultinomialLayer": "dirichletmultinomial",
    "PoissonLayer": "poisson",              # count_layers.py:200
    "ZIPoissonLayer": "zipoisson",
    "NegativeBinomialLayer": "negativebinomial",       # count_layers.py:320
    "NegativeBinomialDispLayer": "negativebinomialdisp",
    "ZINegativeBinomialLayer": "zinb",
    "ZINegativeBinomialDispLayer": "zinbd",
    "MixtureGaussianLayer": "gmm",          # mixture_layers.py:56
    "MixtureNegativeBinomialLayer": "nbmixture",
    "MixtureQLogisticLayer": "mixqlogistic",
    "QuantizedLogisticLayer": "qlogistic",  # quantized.py
    "DeterministicLayer": "deterministic",  # deterministic_layers.py:13
    "VectorDeterministicLayer": "vdeterministic",
    "VonMisesFisherLayer": "vmf",
}


def _make_layer(name: str, alias: str):
  cls = type(name, (DistributionDense,), {
      "__doc__": f"`{alias}` distribution layer (raw params in, "
                 f"distribution out) — see module docstring.",
      "__annotations__": {"posterior": str, "projection": bool},
      "posterior": alias,
      "projection": False,
  })
  return cls


_g = globals()
for _name, _alias in _LAYER_ALIASES.items():
  _g[_name] = _make_layer(_name, _alias)
del _g, _name, _alias
