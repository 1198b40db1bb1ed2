"""Network engine: uniform flax layers + SequentialNetwork + factories.

Reference: ``odin/networks/base_networks.py`` — the Keras `Networks`/
`SequentialNetwork` machinery and the dense/conv/deconv factory conventions
(``:965-1213``) and `NetConf` (``:1219-1538``).  The TPU redesign keeps the
*factory API* but models are flax modules: pure pytrees of params with
``apply`` functions; the training loop lives in ``odin_tpu.training``.

Every layer here accepts ``(x, training=False)`` so sequences can thread the
training flag uniformly (dropout/batchnorm), mirroring the reference's
arg-aware layer calls (``base_networks.py:883-959``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Lambda", "Dense", "Conv", "ConvTranspose", "Flatten", "Reshape",
    "CenterAt0", "LogNorm", "Dropout", "BatchNorm", "SequentialNetwork",
    "dense_network", "conv_network", "deconv_network", "NetConf",
    "get_activation",
]

_ACTIVATIONS: Dict[str, Callable] = {
    "linear": lambda x: x,
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "softmax": jax.nn.softmax,
    "leaky_relu": jax.nn.leaky_relu,
    "relu6": jax.nn.relu6,
    "mish": jax.nn.mish,
    "softsign": jax.nn.soft_sign,
    # reference `softplus1`: softplus shifted to pass through 1 at 0
    # (``backend/alias.py`` — used for strictly-positive scale heads)
    "softplus1": lambda x: jax.nn.softplus(x + np.log(np.e - 1.0)),
}


def get_activation(fn: Union[str, Callable, None]) -> Callable:
  """Resolve an activation alias (reference ``odin/backend/alias.py``)."""
  if fn is None:
    return lambda x: x
  if callable(fn):
    return fn
  key = str(fn).lower()
  if key not in _ACTIVATIONS:
    raise ValueError(f"unknown activation '{fn}'; available: {sorted(_ACTIVATIONS)}")
  return _ACTIVATIONS[key]


class Lambda(nn.Module):
  """Wrap a pure function as a layer."""

  fn: Callable

  def __call__(self, x, training: bool = False):
    return self.fn(x)


class Dense(nn.Module):
  units: int
  activation: Union[str, Callable, None] = None
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    x = nn.Dense(self.units, use_bias=self.use_bias)(x)
    return get_activation(self.activation)(x)


class Conv(nn.Module):
  """2-D convolution, 'same' padding, He init — the reference's conv factory
  convention (``image_networks.py:157-174``)."""

  filters: int
  kernel_size: Union[int, Tuple[int, int]] = 3
  strides: Union[int, Tuple[int, int]] = 1
  activation: Union[str, Callable, None] = None
  padding: str = "SAME"
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
        else (self.kernel_size, self.kernel_size)
    s = self.strides if isinstance(self.strides, (tuple, list)) \
        else (self.strides, self.strides)
    x = nn.Conv(self.filters, k, strides=s, padding=self.padding,
                use_bias=self.use_bias,
                kernel_init=nn.initializers.he_normal())(x)
    return get_activation(self.activation)(x)


class SpaceToDepthConv(nn.Module):
  """Exact algebraic rewrite of ``Conv(filters, kernel=4, strides=2, SAME)``
  for thin-channel images: zero-pad by 1, space-to-depth block 2, then a
  kernel-2 stride-1 VALID conv whose weights are the SAME ``(4, 4, C, F)``
  kernel re-indexed by row/column parity — identical outputs and an
  identical param pytree to the plain Conv (swap freely in checkpoints).

  Motivation (BASELINE.md): on TPU a 64x64x1 input leaves the 128-lane
  vector dim nearly empty and the first conv contracts only 4*4*1=16
  elements against the 128-wide MXU; the s2d form presents the same math as
  a 33x33x4 input with 2x2x4 patches — a layout XLA can tile more densely.
  Used by ``get_networks(..., space_to_depth=True)``.
  """

  filters: int
  activation: Union[str, Callable, None] = None
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, training: bool = False):
    B, H, W, C = x.shape
    kernel = self.param("kernel", nn.initializers.he_normal(),
                        (4, 4, C, self.filters))
    # W2[a, b, (di, dj, c), f] = W[2a + di, 2b + dj, c, f]
    w2 = kernel.reshape(2, 2, 2, 2, C, self.filters)       # (a, di, b, dj, c, f)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5)                    # (a, b, di, dj, c, f)
    w2 = w2.reshape(2, 2, 4 * C, self.filters)
    # SAME for k=4 s=2 pads (1, 1); pad first so H+2 is even for the s2d
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H2, W2_ = (H + 2) // 2, (W + 2) // 2
    xs = xp.reshape(B, H2, 2, W2_, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, H2, W2_, 4 * C)                     # ch = (di, dj, c)
    y = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.use_bias:
      y = y + self.param("bias", nn.initializers.zeros, (self.filters,))
    return get_activation(self.activation)(y)


class _SubpixelConvTranspose(nn.Module):
  """Exact subpixel decomposition of ``nn.ConvTranspose(strides=s, SAME)``.

  A strided transposed conv is XLA-lowered as a conv over the
  ``lhs_dilation``-zero-stuffed input — on TPU the MXU then contracts
  mostly zeros.  Algebraically the SAME-padded case splits by output-pixel
  parity into s×s *dense* stride-1 convs whose taps are the parity slices
  of the original kernel, fused here as ONE conv to ``s·s·F`` channels
  followed by depth-to-space.  With XLA SAME semantics the dilated-input
  offset is ``p0 = k - 1 - (k - s)//2`` per dim, giving
  ``y[s·a + d] = Σ_o x[a + o] · W[s·o + p0 - d]`` — identical outputs
  (fp32 round-off) and an identical param pytree to ``nn.ConvTranspose``,
  so checkpoints swap freely (held by
  tests/test_networks.py::test_subpixel_conv_transpose_exact).
  """

  features: int
  kernel_size: Tuple[int, int]
  strides: Tuple[int, int]
  use_bias: bool = True

  @nn.compact
  def __call__(self, x):
    (kh, kw), (sh, sw) = self.kernel_size, self.strides
    B, H, W, C = x.shape
    F = self.features
    kernel = self.param("kernel", nn.initializers.he_normal(),
                        (kh, kw, C, F))

    def taps(k, s):
      p0 = k - 1 - (k - s) // 2
      per_d = []
      omin, omax = 0, 0
      for d in range(s):
        ok = [((d + kk - p0) // s, kk) for kk in range(k)
              if (d + kk - p0) % s == 0]
        per_d.append(ok)
        omin = min([omin] + [o for o, _ in ok])
        omax = max([omax] + [o for o, _ in ok])
      return per_d, omin, omax

    th, oh_min, oh_max = taps(kh, sh)
    tw, ow_min, ow_max = taps(kw, sw)
    nth, ntw = oh_max - oh_min + 1, ow_max - ow_min + 1
    # K2[mh, mw, c, (dh·sw + dw)·F + f] = W[ih, iw, c, f] at the parity
    # taps — built as ONE gather + mask so the traced graph stays flat.
    ih_map = np.zeros((nth, sh), np.int32)
    mh_msk = np.zeros((nth, sh), np.float32)
    iw_map = np.zeros((ntw, sw), np.int32)
    mw_msk = np.zeros((ntw, sw), np.float32)
    for d in range(sh):
      for o, i in th[d]:
        ih_map[o - oh_min, d], mh_msk[o - oh_min, d] = i, 1.0
    for d in range(sw):
      for o, i in tw[d]:
        iw_map[o - ow_min, d], mw_msk[o - ow_min, d] = i, 1.0
    g = kernel[ih_map[:, None, :, None], iw_map[None, :, None, :]]
    g = g * (mh_msk[:, None, :, None, None, None] *
             mw_msk[None, :, None, :, None, None]).astype(kernel.dtype)
    # g: (nth, ntw, sh, sw, C, F) -> (nth, ntw, C, sh·sw·F)
    k2 = g.transpose(0, 1, 4, 2, 3, 5).reshape(nth, ntw, C, sh * sw * F)
    xp = jnp.pad(x, ((0, 0), (-oh_min, oh_max), (-ow_min, ow_max), (0, 0)))
    z = jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = z.reshape(B, H, W, sh, sw, F).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(B, H * sh, W * sw, F)
    if self.use_bias:
      y = y + self.param("bias", nn.initializers.zeros, (F,))
    return y


class ConvTranspose(nn.Module):
  """2-D transposed convolution.  `subpixel=True` runs the exact
  parity-decomposed form (`_SubpixelConvTranspose` — same outputs, same
  param pytree).  Default OFF: measured on TPU v5e the subpixel form is
  ~19% SLOWER end-to-end than XLA's own conv_transpose lowering
  (benchmarks/deconv_bench.py, BASELINE.md) — XLA already avoids the
  zero-dilated MXU work; the extra depth-to-space transpose costs HBM
  traffic.  Kept for layouts where a dense stride-1 conv wins (very small
  spatial dims / channel-heavy decoders)."""

  filters: int
  kernel_size: Union[int, Tuple[int, int]] = 3
  strides: Union[int, Tuple[int, int]] = 1
  activation: Union[str, Callable, None] = None
  padding: str = "SAME"
  use_bias: bool = True
  subpixel: bool = False

  @nn.compact
  def __call__(self, x, training: bool = False):
    k = tuple(self.kernel_size) if isinstance(self.kernel_size, (tuple, list)) \
        else (self.kernel_size, self.kernel_size)
    s = tuple(self.strides) if isinstance(self.strides, (tuple, list)) \
        else (self.strides, self.strides)
    fast = (self.subpixel and self.padding.upper() == "SAME"
            and max(s) > 1 and x.ndim == 4
            and all(kk >= ss for kk, ss in zip(k, s)))
    if fast:
      impl = _SubpixelConvTranspose(self.filters, k, s,
                                    use_bias=self.use_bias,
                                    name="ConvTranspose_0")
    else:
      impl = nn.ConvTranspose(self.filters, k, strides=s,
                              padding=self.padding, use_bias=self.use_bias,
                              kernel_init=nn.initializers.he_normal(),
                              name="ConvTranspose_0")
    return get_activation(self.activation)(impl(x))


class Flatten(nn.Module):

  def __call__(self, x, training: bool = False):
    return x.reshape(x.shape[:1] + (-1,)) if x.ndim > 1 else x


class Reshape(nn.Module):
  shape: Tuple[int, ...]

  def __call__(self, x, training: bool = False):
    return x.reshape(x.shape[:1] + tuple(self.shape))


class CenterAt0(nn.Module):
  """[0,1] images -> [-1,1] (reference ``image_networks.py:108-135``)."""

  enable: bool = True
  div_255: bool = False

  def __call__(self, x, training: bool = False):
    if not self.enable:
      return x
    if self.div_255:
      x = x / 255.0
    return 2.0 * x - 1.0


class LogNorm(nn.Module):
  """log1p count normalization for gene data
  (reference ``image_networks.py:138``)."""

  scale_factor: float = 10000.0

  def __call__(self, x, training: bool = False):
    s = jnp.sum(x, axis=-1, keepdims=True)
    return jnp.log1p(x / jnp.maximum(s, 1e-8) * self.scale_factor)


class Dropout(nn.Module):
  rate: float = 0.5

  @nn.compact
  def __call__(self, x, training: bool = False):
    return nn.Dropout(self.rate, deterministic=not training)(x)


class BatchNorm(nn.Module):
  """Batch normalization with running averages in the 'batch_stats'
  collection."""

  @nn.compact
  def __call__(self, x, training: bool = False):
    return nn.BatchNorm(use_running_average=not training)(x)


class SkipSequential(nn.Module):
  """Sequential stack where the (flattened, projected) input is re-injected
  additively at every spatial layer — the reference's skip-generator
  decoder (``odin/networks/image_networks.py:177-216`` `SkipSequential`,
  selected via get_networks(skip_generator=True))."""

  layers: Sequence[nn.Module] = ()

  @nn.compact
  def __call__(self, x, training: bool = False):
    z = x.reshape(x.shape[0], -1)
    for i, layer in enumerate(self.layers):
      x = layer(x, training=training) if isinstance(layer, nn.Module) else layer(x)
      if getattr(x, "ndim", 0) == 4:
        # project latent to this feature map and add (1x1 conv equivalent)
        proj = nn.Dense(x.shape[-1], name=f"skip_proj_{i}")(z)
        x = jax.nn.elu(x + proj[:, None, None, :])
    return x


class SequentialNetwork(nn.Module):
  """Call layers in order, threading the training flag.

  ``return_hidden=True`` also returns the list of all intermediate outputs —
  the functional replacement for the reference's stateful capture of encoder
  activations by hierarchical-VAE layer wrappers
  (``odin/bay/vi/autoencoder/hierarchical_vae.py:130``).
  """

  layers: Sequence[nn.Module] = ()

  @nn.compact
  def __call__(self, x, training: bool = False, return_hidden: bool = False):
    hidden = []
    for layer in self.layers:
      x = layer(x, training=training) if isinstance(layer, nn.Module) else layer(x)
      hidden.append(x)
    if return_hidden:
      return x, hidden
    return x


# ---------------------------------------------------------------------------
# factories (reference base_networks.py:965-1213)
# ---------------------------------------------------------------------------
def dense_network(units: Sequence[int],
                  activation: Union[str, Callable] = "relu",
                  batchnorm: bool = False,
                  dropout: float = 0.0,
                  flatten_inputs: bool = True,
                  input_dropout: float = 0.0) -> list:
  """List of layers for an MLP following the reference conventions."""
  layers: list = []
  if flatten_inputs:
    layers.append(Flatten())
  if input_dropout > 0:
    layers.append(Dropout(input_dropout))
  for u in units:
    layers.append(Dense(int(u), activation=None if batchnorm else activation))
    if batchnorm:
      layers.append(BatchNorm())
      layers.append(Lambda(get_activation(activation)))
    if dropout > 0:
      layers.append(Dropout(dropout))
  return layers


def conv_network(filters: Sequence[int],
                 kernel_size: Union[int, Sequence[int]] = 3,
                 strides: Union[int, Sequence[int]] = 2,
                 activation: Union[str, Callable] = "relu",
                 batchnorm: bool = False,
                 dropout: float = 0.0,
                 flatten_outputs: bool = True) -> list:
  n = len(filters)
  ks = kernel_size if isinstance(kernel_size, (list, tuple)) else [kernel_size] * n
  ss = strides if isinstance(strides, (list, tuple)) else [strides] * n
  layers: list = []
  for f, k, s in zip(filters, ks, ss):
    layers.append(Conv(int(f), k, s, activation=None if batchnorm else activation))
    if batchnorm:
      layers.append(BatchNorm())
      layers.append(Lambda(get_activation(activation)))
    if dropout > 0:
      layers.append(Dropout(dropout))
  if flatten_outputs:
    layers.append(Flatten())
  return layers


def deconv_network(filters: Sequence[int],
                   kernel_size: Union[int, Sequence[int]] = 3,
                   strides: Union[int, Sequence[int]] = 2,
                   activation: Union[str, Callable] = "relu",
                   batchnorm: bool = False,
                   dropout: float = 0.0) -> list:
  n = len(filters)
  ks = kernel_size if isinstance(kernel_size, (list, tuple)) else [kernel_size] * n
  ss = strides if isinstance(strides, (list, tuple)) else [strides] * n
  layers: list = []
  for f, k, s in zip(filters, ks, ss):
    layers.append(ConvTranspose(int(f), k, s,
                                activation=None if batchnorm else activation))
    if batchnorm:
      layers.append(BatchNorm())
      layers.append(Lambda(get_activation(activation)))
    if dropout > 0:
      layers.append(Dropout(dropout))
  return layers


@dataclasses.dataclass
class NetConf:
  """Typed network-configuration descriptor
  (reference ``base_networks.py:1225`` `NetConf`).

  `create_network()` builds an MLP or CNN; `create_decoder_network()` builds
  the mirror-image decoder (the reference's `create_autoencoder` convention).
  """

  units: Union[int, Sequence[int]] = 64
  kernel: Union[int, Sequence[int]] = 3
  strides: Union[int, Sequence[int]] = 1
  activation: Union[str, Callable] = "relu"
  batchnorm: bool = False
  input_dropout: float = 0.0
  dropout: float = 0.0
  network: str = "dense"  # 'dense' | 'conv' | 'deconv'
  flatten_inputs: bool = True
  name: Optional[str] = None

  def create_network(self, name: Optional[str] = None) -> SequentialNetwork:
    units = [self.units] if isinstance(self.units, int) else list(self.units)
    if self.network == "dense":
      layers = dense_network(units, self.activation, self.batchnorm,
                             self.dropout, self.flatten_inputs,
                             self.input_dropout)
    elif self.network == "conv":
      layers = conv_network(units, self.kernel, self.strides, self.activation,
                            self.batchnorm, self.dropout)
    elif self.network == "deconv":
      layers = deconv_network(units, self.kernel, self.strides,
                              self.activation, self.batchnorm, self.dropout)
    else:
      raise ValueError(f"unknown network type {self.network}")
    return SequentialNetwork(tuple(layers), name=name or self.name)

  def create_decoder_network(self, output_shape: Sequence[int],
                             name: Optional[str] = None) -> SequentialNetwork:
    """Mirror-image decoder ending at `output_shape` features."""
    units = [self.units] if isinstance(self.units, int) else list(self.units)
    rev = list(reversed(units))
    if self.network == "dense":
      layers = dense_network(rev, self.activation, self.batchnorm,
                             self.dropout, flatten_inputs=False)
      layers.append(Dense(int(np.prod(output_shape)), activation=None))
      layers.append(Reshape(tuple(output_shape)))
    else:
      layers = deconv_network(rev, self.kernel, self.strides, self.activation,
                              self.batchnorm, self.dropout)
      layers.append(Conv(int(output_shape[-1]), 1, 1, activation=None))
    return SequentialNetwork(tuple(layers), name=name or (self.name and self.name + "_decoder"))
