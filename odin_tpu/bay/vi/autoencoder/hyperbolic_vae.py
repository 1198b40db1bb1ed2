"""Hyperspherical VAEs — vMF / PowerSpherical posteriors on the unit sphere.

Reference: ``odin/bay/vi/autoencoder/hyperbolic_vae.py:48,101``
(`HypersphericalVAE`, `PowersphericalVAE`): posterior over S^{d-1} with a
uniform-sphere prior and analytic KL; beta linearly annealed like
AnnealingVAE.  PowerSpherical (De Cao & Aziz 2020) is the TPU-preferred
family — closed-form, rejection-free sampling.
"""
from __future__ import annotations

from typing import Optional, Union

from odin_tpu.backend.interpolation import Interpolation, linear
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi.autoencoder.beta_vae import BetaVAE

__all__ = ["HypersphericalVAE", "PowersphericalVAE"]


class HypersphericalVAE(BetaVAE):
  """Hyperspherical VAE (Davidson et al. 2018)."""

  def __init__(self,
               latents: Optional[RVconf] = None,
               distribution: str = "vonmisesfisher",
               beta: Union[float, Interpolation] = None,
               **kwargs):
    if beta is None:
      beta = linear(vmin=1e-6, vmax=1.0, steps=2000, delay_in=0)
    if latents is None:
      latents = RVconf(64, name="latents")
    distribution = str(distribution).lower()
    alias = {"vonmisesfisher": "vmf", "vmf": "vmf",
             "powerspherical": "powerspherical"}[distribution]
    latents = latents.copy(posterior=alias)
    kwargs.setdefault("analytic", True)
    super().__init__(latents=latents, beta=beta, **kwargs)


class PowersphericalVAE(HypersphericalVAE):

  def __init__(self, **kwargs):
    kwargs.pop("distribution", None)
    super().__init__(distribution="powerspherical", **kwargs)
