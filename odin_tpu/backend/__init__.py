"""Backend: math helpers, schedules, verification metrics.

The reference's ``odin/backend`` was a multi-framework (TF/torch/NumPy)
dispatch layer (``odin/backend/tensor.py:32-104``).  Here there is exactly one
tensor backend — JAX — so this package keeps only what is not already
first-class in jnp: interpolation schedules, verification metrics, and a few
math utilities.
"""
from odin_tpu.backend import interpolation
from odin_tpu.backend.interpolation import Interpolation
from odin_tpu.backend.maths import (
    length_norm,
    log_norm,
    poincare_normalize,
    renorm_rms,
    softplus_inverse,
    to_llh,
    to_llr,
    to_sample_weights,
    whitening,
)
from odin_tpu.backend.metrics import (
    LER,
    binary_accuracy,
    categorical_accuracy,
    compute_AUC,
    compute_Cavg,
    compute_Cnorm,
    compute_EER,
    compute_minDCF,
    confusion_matrix,
    det_curve,
    frechet_distance,
    frechet_inception_distance,
    prc_curve,
    roc_curve,
    roc_curve_,
    LER,
)
from odin_tpu.backend.losses import (
    bayes_binary_crossentropy,
    bayes_crossentropy,
    contrastive_loss,
    correntropy_regularize,
    cosine_similarity,
    jacobian_regularize,
    triplet_loss,
)
from odin_tpu.backend.alias import (
    identity_function,
    parse_activation,
    parse_attention,
    parse_constraint,
    parse_initializer,
    parse_layer,
    parse_loss,
    parse_metric,
    parse_normalizer,
    parse_optimizer,
    parse_reduction,
    parse_regularizer,
)
