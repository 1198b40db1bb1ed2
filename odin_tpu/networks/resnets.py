"""Residual blocks, squeeze-excitation, masked (PixelCNN) convolutions.

Reference: ``odin/networks/resnets.py:36-718`` — `ResidualSequential`,
squeeze-excitation, `MaskedConv2D` (pixelcnn), up/down-sampling blocks.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu.networks.base import get_activation

__all__ = ["SqueezeExcitation", "SigmoidGating", "ResidualBlock",
           "ResidualUpBlock", "ResidualBottleneck", "ResidualInverted",
           "residual_design", "ResidualSequential", "MaskedConv2D",
           "DownSample", "UpSample", "PixelCNNDecoder"]


class SigmoidGating(nn.Module):
  """Split channels in half, gate the first half by sigmoid of the second
  (GLU; reference ``resnets.py:144-150``)."""

  def __call__(self, x, training: bool = False):
    activation, gate_logits = jnp.split(x, 2, axis=-1)
    return jax.nn.sigmoid(gate_logits) * activation


class SqueezeExcitation(nn.Module):
  """SE channel gating (reference resnets.py)."""

  ratio: int = 4

  @nn.compact
  def __call__(self, x, training: bool = False):
    c = x.shape[-1]
    s = jnp.mean(x, axis=(1, 2))                       # (B, C)
    s = jax.nn.relu(nn.Dense(max(c // self.ratio, 1))(s))
    s = jax.nn.sigmoid(nn.Dense(c)(s))
    return x * s[:, None, None, :]


class ResidualBlock(nn.Module):
  """conv-act-conv + skip, optional SE and projection shortcut."""

  filters: int
  kernel_size: int = 3
  strides: int = 1
  activation: str = "relu"
  use_se: bool = False
  batchnorm: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    k = (self.kernel_size, self.kernel_size)
    h = nn.Conv(self.filters, k, strides=(self.strides, self.strides),
                padding="SAME")(x)
    if self.batchnorm:
      h = nn.BatchNorm(use_running_average=not training)(h)
    h = act(h)
    h = nn.Conv(self.filters, k, padding="SAME")(h)
    if self.batchnorm:
      h = nn.BatchNorm(use_running_average=not training)(h)
    if self.use_se:
      h = SqueezeExcitation()(h, training=training)
    if x.shape[-1] != self.filters or self.strides != 1:
      x = nn.Conv(self.filters, (1, 1),
                  strides=(self.strides, self.strides))(x)
    return act(x + h)


class ResidualUpBlock(nn.Module):
  """Up-sampling residual block (reference resnets.py up-sampling
  variants): transposed-conv main path + transposed 1x1 shortcut, optional
  SE gating."""

  filters: int
  kernel_size: int = 3
  strides: int = 2
  activation: str = "relu"
  use_se: bool = False
  batchnorm: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    k = (self.kernel_size, self.kernel_size)
    s = (self.strides, self.strides)
    h = nn.ConvTranspose(self.filters, k, strides=s, padding="SAME")(x)
    if self.batchnorm:
      h = nn.BatchNorm(use_running_average=not training)(h)
    h = act(h)
    h = nn.Conv(self.filters, k, padding="SAME")(h)
    if self.batchnorm:
      h = nn.BatchNorm(use_running_average=not training)(h)
    if self.use_se:
      h = SqueezeExcitation()(h, training=training)
    if x.shape[-1] != self.filters or self.strides != 1:
      x = nn.ConvTranspose(self.filters, (1, 1), strides=s,
                           padding="SAME")(x)
    return act(x + h)


class _ResidualConvBlock(nn.Module):
  """Shared body of `ResidualBottleneck` / `ResidualInverted`: a kxk conv
  resizing channels by the subclass ratio, a middle kxk conv (plain or
  depthwise per subclass), optional squeeze-excitation, then a 1x1
  projection back to `filters_out` (optionally GLU sigmoid-gated).  The
  identity skip exists only when shapes are preserved (filters_out ==
  filters_in and stride 1), as in the reference."""

  filters_out: Optional[int] = None
  se_ratio: float = 0.25
  sigmoid_gating: bool = False
  batchnorm: bool = True
  kernel_size: int = 3
  strides: int = 1
  activation: str = "swish"
  dropout: float = 0.0

  def _channel_ratio(self) -> float:
    raise NotImplementedError

  def _mid_groups(self, filters: int) -> int:
    return 1  # plain conv; inverted overrides with `filters` (depthwise)

  @nn.compact
  def __call__(self, x, training: bool = False):
    act = get_activation(self.activation)
    k = (self.kernel_size, self.kernel_size)
    filters_in = x.shape[-1]
    filters = max(1, int(filters_in * self._channel_ratio()))
    filters_out = self.filters_out or filters_in
    use_bias = not self.batchnorm

    def bn(h):
      return (nn.BatchNorm(use_running_average=not training)(h)
              if self.batchnorm else h)

    h = nn.Conv(filters, k, strides=(self.strides, self.strides),
                padding="SAME", use_bias=use_bias)(x)
    h = act(bn(h))
    h = nn.Conv(filters, k, padding="SAME",
                feature_group_count=self._mid_groups(filters))(h)
    h = act(bn(h))
    if self.se_ratio:
      h = SqueezeExcitation(ratio=max(int(1 / self.se_ratio), 1))(
          h, training=training)
    h = nn.Conv(filters_out * (2 if self.sigmoid_gating else 1), (1, 1),
                use_bias=use_bias)(h)
    h = bn(h)
    if self.sigmoid_gating:
      h = SigmoidGating()(h)
    if filters_out == filters_in and self.strides == 1:
      if self.dropout > 0:
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
      return x + h
    return h


class ResidualBottleneck(_ResidualConvBlock):
  """He-style bottleneck residual block (reference
  ``odin/networks/resnets.py:618-716`` `residual_bottleneck`): squeeze the
  channel dim by `shrink_ratio` through two kxk convs, then expand back to
  `filters_out` with a 1x1 projection."""

  shrink_ratio: float = 0.5

  def _channel_ratio(self) -> float:
    return self.shrink_ratio


class ResidualInverted(_ResidualConvBlock):
  """MobileNetV2/EfficientNet inverted residual (reference
  ``odin/networks/resnets.py:718-811`` `residual_inverted`): expand channels
  by `expand_ratio` with a kxk conv, depthwise kxk conv, optional SE, then a
  1x1 linear projection back to `filters_out`."""

  expand_ratio: float = 2.0

  def _channel_ratio(self) -> float:
    return self.expand_ratio

  def _mid_groups(self, filters: int) -> int:
    return filters  # depthwise: feature_group_count == channels


def residual_design(design: str = "bottleneck", ratio: Optional[float] = None,
                    **kwargs):
  """Dispatcher mirroring the reference's `residual` factory
  (``odin/networks/resnets.py:606-616``): 'bottleneck' -> shrink_ratio,
  'inverted' -> expand_ratio."""
  if design == "bottleneck":
    if ratio is not None:
      kwargs["shrink_ratio"] = ratio
    return ResidualBottleneck(**kwargs)
  if design == "inverted":
    if ratio is not None:
      kwargs["expand_ratio"] = ratio
    return ResidualInverted(**kwargs)
  raise NotImplementedError(f"no support for residual design: {design!r}")


class ResidualSequential(nn.Module):
  """Stack of residual blocks (reference `ResidualSequential`); negative
  strides select up-sampling blocks (-2 -> ResidualUpBlock(strides=2))."""

  filters: Sequence[int] = (64, 64)
  kernel_size: int = 3
  strides: Sequence[int] = None
  activation: str = "relu"
  use_se: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    strides = self.strides or [1] * len(self.filters)
    for f, s in zip(self.filters, strides):
      if int(s) < 0:
        x = ResidualUpBlock(int(f), self.kernel_size, -int(s),
                            self.activation, self.use_se)(x,
                                                          training=training)
      else:
        x = ResidualBlock(int(f), self.kernel_size, int(s), self.activation,
                          self.use_se)(x, training=training)
    return x


class MaskedConv2D(nn.Module):
  """PixelCNN masked convolution, mask type 'A' (excludes center) or 'B'
  (reference `MaskedConv2D`)."""

  filters: int
  kernel_size: int = 3
  mask_type: str = "A"

  @nn.compact
  def __call__(self, x, training: bool = False):
    k = self.kernel_size
    kernel = self.param("kernel", nn.initializers.he_normal(),
                        (k, k, x.shape[-1], self.filters))
    bias = self.param("bias", nn.initializers.zeros, (self.filters,))
    mask = np.ones((k, k, 1, 1), np.float32)
    mask[k // 2, k // 2 + (1 if self.mask_type == "B" else 0):] = 0.0
    mask[k // 2 + 1:] = 0.0
    y = jax.lax.conv_general_dilated(
        x, kernel * jnp.asarray(mask), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


class DownSample(nn.Module):
  """Strided-conv downsampling block."""

  filters: int
  factor: int = 2
  activation: str = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    y = nn.Conv(self.filters, (self.factor * 2, self.factor * 2),
                strides=(self.factor, self.factor), padding="SAME")(x)
    return get_activation(self.activation)(y)


class UpSample(nn.Module):
  """Transposed-conv upsampling block."""

  filters: int
  factor: int = 2
  activation: str = "relu"

  @nn.compact
  def __call__(self, x, training: bool = False):
    y = nn.ConvTranspose(self.filters, (self.factor * 2, self.factor * 2),
                         strides=(self.factor, self.factor), padding="SAME")(x)
    return get_activation(self.activation)(y)


class PixelCNNDecoder(nn.Module):
  """Small PixelCNN decoder head for CIFAR VAEs
  (reference ``image_networks.py:303`` `PixelCNNDecoder`): latent -> spatial
  tanh projection -> masked conv stack -> likelihood params."""

  output_shape: Tuple[int, int, int] = (32, 32, 3)
  n_filters: int = 32
  n_layers: int = 4
  n_params: int = 2

  @nn.compact
  def __call__(self, z, training: bool = False):
    h, w, c = self.output_shape
    x = jnp.tanh(nn.Dense(h * w * c, name="decoder0")(z))
    x = x.reshape(-1, h, w, c)
    y = MaskedConv2D(self.n_filters, 7, mask_type="A")(x)
    for i in range(self.n_layers):
      y = jax.nn.relu(y)
      y = MaskedConv2D(self.n_filters, 3, mask_type="B")(y)
    y = jax.nn.relu(y)
    return nn.Conv(c * self.n_params, (1, 1))(y)
