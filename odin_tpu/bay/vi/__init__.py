"""Variational inference: VAE zoo + disentanglement evaluation
(reference: ``odin/bay/vi``)."""
from odin_tpu.bay.vi._base import VariationalModel, traverse_dims
from odin_tpu.bay.vi.utils import (
    discretizing,
    marginalize_categorical_labels,
    permute_dims,
    prepare_ssl_inputs,
    split_ssl_inputs,
)
from odin_tpu.bay.vi.autoencoder import *  # noqa: F401,F403
from odin_tpu.bay.vi.autoencoder import get_vae
from odin_tpu.bay.vi.disentanglement_gym import (
    DisentanglementGym,
    GroundTruth,
    concat_mean,
    first_mean,
    plot_latent_stats,
)
from odin_tpu.bay.vi.losses import (
    disentangled_inferred_prior_loss,
    gaussian_kernel,
    get_divergence,
    linear_kernel,
    maximum_mean_discrepancy,
    pairwise_distances,
    polynomial_kernel,
    total_correlation,
)
from odin_tpu.bay.vi.metrics import (
    Correlation,
    correlation_matrix,
    discrete_entropy,
    discrete_mutual_info,
    mutual_info_estimate,
    mutual_info_gap,
    relative_strength,
    unsupervised_clustering_scores,
)
from odin_tpu.bay.vi.downstream_metrics import (
    beta_vae_score,
    completeness_score,
    dci_scores,
    disentanglement_score,
    factor_vae_score,
    importance_matrix,
    separated_attr_predictability,
)
