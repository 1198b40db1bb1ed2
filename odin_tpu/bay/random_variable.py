"""RVconf — declarative random-variable descriptor.

Reference: ``odin/bay/random_variable.py:175`` — a dataclass describing a
random variable (event_shape, posterior family alias, projection flag, prior,
extra kwargs) that builds the corresponding `DistributionDense` head.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import numpy as np

from odin_tpu.bay.distribution_alias import parse_distribution
from odin_tpu.bay.distributions import Distribution
from odin_tpu.bay.layers.dense_distribution import DistributionDense

__all__ = ["RVconf"]


@dataclasses.dataclass
class RVconf:
  """Descriptor for a random variable head.

  Example::

    latents = RVconf(32, 'mvndiag', projection=True, name='latents')
    observation = RVconf((28, 28, 1), 'bernoulli', projection=True,
                         name='image')
  """

  event_shape: Union[int, Sequence[int]] = ()
  posterior: str = "normal"
  projection: bool = True
  autoregressive: bool = False
  dropout: float = 0.0
  name: str = "variable"
  prior: Optional[Distribution] = None
  kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)

  def __post_init__(self):
    if isinstance(self.event_shape, (int, np.integer)):
      self.event_shape = (int(self.event_shape),)
    else:
      self.event_shape = tuple(int(i) for i in self.event_shape)

  @property
  def event_size(self) -> int:
    return int(np.prod(self.event_shape)) if len(self.event_shape) else 1

  @property
  def params_size(self) -> int:
    spec = parse_distribution(self.posterior)
    return int(spec.params_size(self.event_size, **self.kwargs))

  def create_posterior(self, name: Optional[str] = None) -> DistributionDense:
    """Build the DistributionDense head
    (reference ``random_variable.py:360-434``)."""
    return DistributionDense(
        event_shape=self.event_shape,
        posterior=self.posterior,
        posterior_kwargs=dict(self.kwargs),
        projection=self.projection,
        autoregressive=self.autoregressive,
        dropout=self.dropout,
        name=name or self.name,
    )

  def create_prior(self) -> Optional[Distribution]:
    if self.prior is not None:
      return self.prior
    spec = parse_distribution(self.posterior)
    return spec.default_prior(self.event_shape, **self.kwargs)

  def copy(self, **overrides) -> "RVconf":
    data = dataclasses.asdict(self)
    data.update(overrides)
    return RVconf(**data)
