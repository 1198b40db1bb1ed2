"""Topic-model components (reference: ``odin/bay/mixed_membership`` —
amortized `LatentDirichletAllocation`): re-exports the TPU implementations
living in the VAE zoo."""
from odin_tpu.bay.vi.autoencoder.lda_vae import (  # noqa: F401
    ALDA,
    LatentDirichletDecoder,
    amortizedLDA,
    auxiliaryLDA,
    nonlinearLDA,
)

LatentDirichletAllocation = LatentDirichletDecoder  # reference class name

__all__ = ["LatentDirichletAllocation", "LatentDirichletDecoder",
           "amortizedLDA", "auxiliaryLDA", "nonlinearLDA", "ALDA"]
