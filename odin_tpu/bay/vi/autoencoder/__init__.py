"""The VAE zoo + `get_vae` registry
(reference: ``odin/bay/vi/autoencoder/__init__.py:28``)."""
import inspect
from typing import Type, Union

from odin_tpu.bay.vi.autoencoder.variational_autoencoder import (
    VAE,
    Autoencoder,
    VAECore,
    VariationalAutoencoder,
)
from odin_tpu.bay.vi.autoencoder.beta_vae import (
    AnnealingVAE,
    Beta10VAE,
    BetaCapacityVAE,
    BetaGammaVAE,
    BetaTCVAE,
    BetaVAE,
    Gamma10VAE,
)
from odin_tpu.bay.vi.autoencoder.dip_vae import DIPVAE
from odin_tpu.bay.vi.autoencoder.factor_discriminator import FactorDiscriminator
from odin_tpu.bay.vi.autoencoder.factor_vae import (
    Factor2VAE,
    FactorVAE,
    SemiFactor2VAE,
    SemiFactorVAE,
)
from odin_tpu.bay.vi.autoencoder.hyperbolic_vae import (
    HypersphericalVAE,
    PowersphericalVAE,
)
from odin_tpu.bay.vi.autoencoder.info_vae import InfoVAE, MIVAE
from odin_tpu.bay.vi.autoencoder.irm_vae import ImplicitRankMinimizer, irmAE, irmVAE
from odin_tpu.bay.vi.autoencoder.auxiliary_vae import AuxiliaryVAE, auxiliaryVAE
from odin_tpu.bay.vi.autoencoder.deterministic import DistEncoder
from odin_tpu.bay.vi.autoencoder.conditional_vae import (
    ConditionalM2VAE,
    M2VAE,
    StructuredSemiVAE,
    reparamsM3VAE,
)
from odin_tpu.bay.vi.autoencoder.hierarchical_vae import (
    BiConvLatents,
    BiDenseLatents,
    ParallelLatents,
    HierarchicalVAE,
    LadderVAE,
    PUnetVAE,
    UnetVAE,
    VeryDeepVAE,
)
from odin_tpu.bay.vi.autoencoder.lda_vae import (
    ALDA,
    amortizedLDA,
    auxiliaryLDA,
    LatentDirichletDecoder,
    nonlinearLDA,
)
from odin_tpu.bay.vi.autoencoder.multitask_vae import (
    MultiheadVAE,
    MultitaskVAE,
    SkiptaskVAE,
)
from odin_tpu.bay.vi.autoencoder.semafo_vae import (
    RemafoVAE,
    SemafoVAE,
    semafod,
    semafoh,
    semafop,
    semafos,
    semafosc,
    semafosm,
    semafot,
)
from odin_tpu.bay.vi.autoencoder.cycle_vae import CycleConsistentVAE
from odin_tpu.bay.vi.autoencoder.moe_vae import MoeVAE
from odin_tpu.bay.vi.autoencoder.sequential_vae import (
    SequentialAttentionVAE,
    SequentialVAE,
    VariationalRNN,
)
from odin_tpu.bay.vi.autoencoder.self_supervised_vae import (
    AdaptiveVAE,
    GroupVAE,
    MultiLevelVAE,
    WeaklySupervisedVAE,
)
from odin_tpu.bay.vi.autoencoder.stochastic_vae import ImputeVAE, StochasticVAE
from odin_tpu.bay.vi.autoencoder.two_stage_vae import TwoStageVAE
from odin_tpu.bay.vi.autoencoder.vamprior import VampriorVAE
from odin_tpu.bay.vi.autoencoder.vq_vae import VQVAE, VectorQuantizer

__all__ = [
    "VariationalAutoencoder", "VAE", "Autoencoder", "BetaVAE", "Beta10VAE",
    "BetaGammaVAE", "Gamma10VAE", "AnnealingVAE", "BetaTCVAE",
    "BetaCapacityVAE", "FactorVAE", "SemiFactorVAE", "Factor2VAE",
    "SemiFactor2VAE", "FactorDiscriminator",
    "InfoVAE", "MIVAE", "DIPVAE", "irmVAE", "irmAE", "HypersphericalVAE",
    "PowersphericalVAE", "TwoStageVAE", "VampriorVAE", "VQVAE",
    "VectorQuantizer", "MultitaskVAE", "SkiptaskVAE", "MultiheadVAE",
    "M2VAE", "ConditionalM2VAE", "StructuredSemiVAE", "reparamsM3VAE",
    "auxiliaryVAE", "AuxiliaryVAE", "SemafoVAE", "RemafoVAE", "semafod",
    "semafoh", "semafos", "semafosm", "semafosc", "semafop", "semafot",
    "HierarchicalVAE", "LadderVAE", "UnetVAE", "PUnetVAE", "VeryDeepVAE",
    "BiConvLatents", "BiDenseLatents", "ParallelLatents", "amortizedLDA", "auxiliaryLDA", "nonlinearLDA", "ALDA",
    "StochasticVAE", "ImputeVAE", "DistEncoder", "GroupVAE", "MultiLevelVAE",
    "AdaptiveVAE", "WeaklySupervisedVAE", "VariationalRNN", "SequentialVAE",
    "CycleConsistentVAE", "MoeVAE", "SequentialAttentionVAE",
    "get_vae", "get_all_vae",
]


def _zoo():
  out = {}
  for k, v in globals().items():
    if inspect.isclass(v) and issubclass(v, VariationalAutoencoder):
      out[k.lower()] = v
  return out


def get_vae(name: Union[str, Type[VariationalAutoencoder]] = None):
  """Look up a VAE class by (case-insensitive) name; with no argument,
  return all classes (reference ``autoencoder/__init__.py:28``)."""
  if name is None:
    return sorted(set(_zoo().values()), key=lambda c: c.__name__)
  if inspect.isclass(name) and issubclass(name, VariationalAutoencoder):
    return name
  key = str(name).lower().replace("_", "")
  zoo = _zoo()
  if key in zoo:
    return zoo[key]
  # allow 'vae' suffix omission: get_vae('beta') -> BetaVAE
  if key + "vae" in zoo:
    return zoo[key + "vae"]
  raise ValueError(f"cannot find VAE with name '{name}'; "
                   f"available: {sorted(zoo)}")


def get_all_vae():
  return get_vae(None)
