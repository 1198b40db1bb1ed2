"""Fused device kernels (XLA + Pallas) for the hot compute paths:
feature extraction (ops/features.py, ops/pallas_features.py) and tiled
online-softmax attention (ops/pallas_attention.py)."""
from odin_tpu.ops.features import (
    FeatureConfig,
    dft_bases,
    frame_signal,
    speech_features,
)
from odin_tpu.ops.pallas_attention import flash_attention, flash_attention_fn
