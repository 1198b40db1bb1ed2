"""Variational inference: VAE zoo + disentanglement evaluation
(reference: ``odin/bay/vi``)."""
from odin_tpu.bay.vi._base import VariationalModel, traverse_dims
from odin_tpu.bay.vi.autoencoder import *  # noqa: F401,F403
from odin_tpu.bay.vi.autoencoder import get_vae
