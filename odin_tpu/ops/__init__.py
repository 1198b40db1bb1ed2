"""Fused device kernels (XLA + Pallas) for the hot feature-extraction path."""
from odin_tpu.ops.features import (
    FeatureConfig,
    dft_bases,
    frame_signal,
    speech_features,
)
