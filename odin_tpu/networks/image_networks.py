"""Per-dataset architectures + optimizer budgets.

Reference: ``odin/networks/image_networks.py`` — `mnist_networks` (:223),
`cifar_networks` (:303), `dsprites_networks` (:436), `shapes3d_networks`
(:560), `celeba_networks` (:661), gene networks (:732,815), the `get_networks`
dispatcher (:907) and `get_optimizer_info` training budgets (:936-1013).

Architectures follow the reference layer-for-layer (filter counts, kernel
sizes, strides, elu activations, projection dims) so ELBO trajectories are
comparable; the implementation is flax and the observation heads are
DistributionDense(projection=False) fed by the decoder's final conv.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from odin_tpu.bay.random_variable import RVconf
from odin_tpu.networks.base import (
    CenterAt0,
    Conv,
    ConvTranspose,
    Dense,
    Flatten,
    Lambda,
    LogNorm,
    Reshape,
    SequentialNetwork,
    SkipSequential,
    SpaceToDepthConv,
)


def _decoder_network(layers, skip_generator: bool = False,
                     name: str = "decoder"):
  """Plain sequential decoder, or the skip-generator variant that re-injects
  the latent at every feature map (reference `SkipSequential`,
  ``image_networks.py:177-216``)."""
  cls = SkipSequential if skip_generator else SequentialNetwork
  return cls(tuple(layers), name=name)

__all__ = [
    "mnist_networks", "fashionmnist_networks", "binarizedmnist_networks",
    "omniglot_networks", "cifar_networks", "cifar10_networks",
    "cifar20_networks", "cifar100_networks", "svhn_networks",
    "dsprites_networks", "vq_dsprites_networks", "shapes3d_networks",
    "locatello_networks", "celeba_networks",
    "halfmoons_networks", "cortex_networks", "pbmc_networks",
    "get_networks", "get_optimizer_info", "PackImageParams",
]


class PackImageParams(nn.Module):
  """(B, H, W, C·n) conv output -> (B, n·H·W·C) flat params whose chunk `i`
  is the i-th parameter map — the layout the alias builders expect.  Mirrors
  the reference's `tf.split(params, n, -1)` channel convention
  (``image_networks.py:55-71``)."""

  n_params: int

  def __call__(self, x, training: bool = False):
    if self.n_params == 1:
      return x.reshape(x.shape[0], -1)
    b, h, w, cn = x.shape
    c = cn // self.n_params
    chunks = [x[..., i * c:(i + 1) * c].reshape(b, -1)
              for i in range(self.n_params)]
    return jnp.concatenate(chunks, axis=-1)


def _obs_distribution(input_shape: Tuple[int, ...], distribution: str):
  """n_params + observation RVconf for an image likelihood
  (reference `_parse_distribution`, ``image_networks.py:46-105``)."""
  if distribution == "bernoulli":
    n_params = 1
  elif distribution in ("gaussian", "normal"):
    n_params = 2
  elif distribution in ("qlogistic", "quantizedlogistic"):
    n_params = 2
  elif distribution in ("mixqlogistic", "mixqlogist"):
    raise NotImplementedError("use the PixelCNN decoder for mixture likelihoods")
  else:
    n_params = RVconf(input_shape, distribution).params_size // int(np.prod(input_shape))
  observation = RVconf(input_shape, distribution, projection=False,
                       name="image").create_posterior()
  return n_params, observation


def mnist_networks(
    qz: str = "mvndiag",
    zdim: Optional[int] = None,
    activation: Union[str, Callable] = "elu",
    is_semi_supervised: bool = False,
    is_hierarchical: bool = False,
    centerize_image: bool = True,
    skip_generator: bool = False,
    **kwargs,
) -> Dict[str, Any]:
  """Networks for 28x28 images (reference ``image_networks.py:223-298``):
  conv 32-32-64-64 (stride 1-2-1-2) -> proj 196; mirror-image deconv."""
  n_channels = int(kwargs.get("n_channels", 1))
  proj_dim = 196
  input_shape = (28, 28, n_channels)
  zdim = 32 if zdim is None else int(zdim)
  n_params, observation = _obs_distribution(
      input_shape, kwargs.get("distribution", "bernoulli"))
  encoder = SequentialNetwork((
      CenterAt0(enable=centerize_image),
      Conv(32, 5, 1, activation),   # 28, 28, 32
      Conv(32, 5, 2, activation),   # 14, 14, 32
      Conv(64, 5, 1, activation),   # 14, 14, 64
      Conv(64, 5, 2, activation),   # 7, 7, 64
      Flatten(),
      Dense(proj_dim, activation=None),
  ), name="encoder")
  decoder = _decoder_network((
      Dense(proj_dim, activation=None),
      Reshape((7, 7, proj_dim // 49)),
      ConvTranspose(64, 5, 2, activation),  # 14, 14, 64
      Conv(64, 5, 1, activation),           # 14, 14, 64
      ConvTranspose(32, 5, 2, activation),  # 28, 28, 32
      Conv(32, 5, 1, activation),           # 28, 28, 32
      Conv(n_channels * n_params, 1, 1, None),
      PackImageParams(n_params),
  ), skip_generator)
  networks = dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=observation,
      input_shape=input_shape,
      # indices of encoder/decoder layers where hierarchical (ladder) latents
      # hook in: (decoder_layer, encoder_layer, conv spec) — functional
      # replacement for BiConvLatents wrappers (``image_networks.py:262-268``)
      hierarchy=(dict(decoder_layer=3, encoder_layer=3, channels=64,
                      filters=16, kernel_size=14, strides=7),),
  )
  if is_semi_supervised:
    networks["labels"] = RVconf(
        int(kwargs.get("n_classes", 10)), "onehot", projection=True,
        name=kwargs.get("labels_name", "digits"))
  return networks


fashionmnist_networks = functools.partial(mnist_networks, labels_name="fashion")
binarizedmnist_networks = mnist_networks
omniglot_networks = functools.partial(mnist_networks, n_channels=3)
halfmnist_networks = mnist_networks


def cifar_networks(
    qz: str = "mvndiag",
    zdim: Optional[int] = None,
    activation: Union[str, Callable] = "elu",
    is_semi_supervised: bool = False,
    is_hierarchical: bool = False,
    centerize_image: bool = True,
    skip_generator: bool = False,
    resnet: bool = False,
    **kwargs,
) -> Dict[str, Any]:
  """Networks for 32x32x3 images (reference ``image_networks.py:303-416``).

  ``resnet=True`` swaps the plain conv stacks for squeeze-excitation
  residual blocks (down-sampling encoder / up-sampling decoder — reference
  ``resnets.py:36-718`` used on CIFAR)."""
  n_channels = int(kwargs.get("n_channels", 3))
  input_shape = (32, 32, n_channels)
  zdim = 256 if zdim is None else int(zdim)
  proj_dim = 8 * 8 * 8
  n_params, observation = _obs_distribution(
      input_shape, kwargs.get("distribution", "qlogistic"))
  if resnet:
    from odin_tpu.networks.resnets import ResidualSequential
    encoder = SequentialNetwork((
        CenterAt0(enable=centerize_image),
        ResidualSequential(filters=(32, 32, 64, 64), strides=(1, 2, 1, 2),
                           activation=activation, use_se=True),  # 8, 8, 64
        Flatten(),
        Dense(proj_dim, activation=None),
    ), name="encoder")
    decoder = _decoder_network((
        Dense(proj_dim, activation=None),
        Reshape((8, 8, proj_dim // 64)),
        ResidualSequential(filters=(64, 64, 32, 32), strides=(-2, 1, -2, 1),
                           activation=activation, use_se=True),  # 32, 32, 32
        Conv(n_channels * n_params, 1, 1, None),
        PackImageParams(n_params),
    ), skip_generator)
  else:
    encoder = SequentialNetwork((
        CenterAt0(enable=centerize_image),
        Conv(32, 4, 1, activation),   # 32, 32, 32
        Conv(32, 4, 2, activation),   # 16, 16, 32
        Conv(64, 4, 1, activation),   # 16, 16, 64
        Conv(64, 4, 2, activation),   # 8, 8, 64
        Flatten(),
        Dense(proj_dim, activation=None),
    ), name="encoder")
    decoder = _decoder_network((
        Dense(proj_dim, activation=None),
        Reshape((8, 8, proj_dim // 64)),
        ConvTranspose(64, 4, 2, activation),  # 16, 16, 64
        Conv(64, 4, 1, activation),           # 16, 16, 64
        ConvTranspose(32, 4, 2, activation),  # 32, 32, 32
        Conv(32, 4, 1, activation),           # 32, 32, 32
        Conv(n_channels * n_params, 1, 1, None),
        PackImageParams(n_params),
    ), skip_generator)
  networks = dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=observation,
      input_shape=input_shape,
      # ladder hook indices match the plain conv stack; the resnet stack has
      # no per-resolution layer boundaries to hook
      hierarchy=() if resnet else (
          dict(decoder_layer=3, encoder_layer=3, channels=64, filters=32,
               kernel_size=8, strides=4),
          dict(decoder_layer=5, encoder_layer=1, channels=32, filters=16,
               kernel_size=8, strides=4),
      ),
  )
  if is_semi_supervised:
    networks["labels"] = RVconf(int(kwargs.get("n_classes", 10)), "onehot",
                                projection=True, name="labels")
  return networks


cifar10_networks = functools.partial(cifar_networks, n_classes=10)
cifar20_networks = functools.partial(cifar_networks, n_classes=20)
cifar100_networks = functools.partial(cifar_networks, n_classes=100)
svhn_networks = functools.partial(cifar_networks, n_classes=10)


def dsprites_networks(
    qz: str = "mvndiag",
    zdim: Optional[int] = None,
    activation: Union[str, Callable] = "elu",
    is_semi_supervised: bool = False,
    is_hierarchical: bool = False,
    centerize_image: bool = True,
    skip_generator: bool = False,
    **kwargs,
) -> Dict[str, Any]:
  """Networks for 64x64 images (reference ``image_networks.py:436-557``):
  conv 32-32-64-64 stride 2, kernel 4, proj 128."""
  n_channels = int(kwargs.get("n_channels", 1))
  input_shape = (64, 64, n_channels)
  zdim = 10 if zdim is None else int(zdim)
  # width=1 is the reference 32-32-64-64 trunk; larger multipliers widen
  # every channel count — a TPU scaling knob (the 128-wide MXU is
  # under-contracted by the reference widths; see BASELINE.md MFU table)
  w = int(kwargs.get("width", 1))
  proj_dim = int(kwargs.get("proj_dim") or
                 (128 if n_channels == 1 else 256) * w)
  n_params, observation = _obs_distribution(
      input_shape, kwargs.get("distribution", "bernoulli"))
  # space_to_depth=True swaps the thin-channel first conv for its exact
  # s2d rewrite (see `SpaceToDepthConv`); identical math, TPU-layout study
  # recorded in benchmarks/first_conv_bench.py
  first_conv = (SpaceToDepthConv(32 * w, activation)
                if kwargs.get("space_to_depth")
                else Conv(32 * w, 4, 2, activation))
  encoder = SequentialNetwork((
      CenterAt0(enable=centerize_image),
      first_conv,                       # 32, 32, 32w
      Conv(32 * w, 4, 2, activation),   # 16, 16, 32w
      Conv(64 * w, 4, 2, activation),   # 8, 8, 64w
      Conv(64 * w, 4, 2, activation),   # 4, 4, 64w
      Flatten(),
      Dense(proj_dim, activation=None),
  ), name="encoder")
  decoder = _decoder_network((
      Dense(proj_dim, activation=None),
      Reshape((4, 4, proj_dim // 16)),
      ConvTranspose(64 * w, 4, 2, activation),  # 8, 8, 64w
      ConvTranspose(64 * w, 4, 2, activation),  # 16, 16, 64w
      ConvTranspose(32 * w, 4, 2, activation),  # 32, 32, 32w
      ConvTranspose(32 * w, 4, 2, activation),  # 64, 64, 32w
      Conv(n_channels * n_params, 1, 1, None),
      PackImageParams(n_params),
  ), skip_generator)
  networks = dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=observation,
      input_shape=input_shape,
      hierarchy=(dict(decoder_layer=3, encoder_layer=2, channels=64,
                      filters=16, kernel_size=8, strides=4),),
  )
  if is_semi_supervised:
    # The reference attaches a mixed Blockwise head (VonMises orientation,
    # Gamma scale, Categorical shape, Bernoulli x/y positions,
    # ``image_networks.py:418-433``); here the 5 factors are predicted with a
    # gaussian regression head (the Gym discretizes factors for scoring).
    networks["labels"] = RVconf(int(kwargs.get("n_factors", 5)), "gaussian",
                                projection=True, name="factors")
  return networks


dspritessmall_networks = dsprites_networks
dsprites0_networks = dsprites_networks


def vq_dsprites_networks(
    activation: Union[str, Callable] = "elu",
    centerize_image: bool = True,
    **kwargs,
) -> Dict[str, Any]:
  """Map-preserving networks for the SPATIAL VQ-VAE (the reference's actual
  design quantizes the conv feature map, not one bottleneck vector —
  ``odin/bay/vi/autoencoder/vq_vae.py:60-247``): the encoder stops at the
  8x8 feature map (no Flatten/Dense), the decoder consumes the quantized
  8x8 code map.  Pass to ``VQVAE(spatial=True, ema=True, ...)``."""
  n_channels = int(kwargs.get("n_channels", 1))
  input_shape = (64, 64, n_channels)
  w = int(kwargs.get("width", 1))
  n_params, observation = _obs_distribution(
      input_shape, kwargs.get("distribution", "bernoulli"))
  encoder = SequentialNetwork((
      CenterAt0(enable=centerize_image),
      Conv(32 * w, 4, 2, activation),   # 32, 32, 32w
      Conv(32 * w, 4, 2, activation),   # 16, 16, 32w
      Conv(64 * w, 4, 2, activation),   # 8, 8, 64w
      Conv(64 * w, 3, 1, activation),   # 8, 8, 64w (map kept: no Flatten)
  ), name="encoder")
  decoder = _decoder_network((
      Conv(64 * w, 3, 1, activation),           # 8, 8, 64w
      ConvTranspose(64 * w, 4, 2, activation),  # 16, 16, 64w
      ConvTranspose(32 * w, 4, 2, activation),  # 32, 32, 32w
      ConvTranspose(32 * w, 4, 2, activation),  # 64, 64, 32w
      Conv(n_channels * n_params, 1, 1, None),
      PackImageParams(n_params),
  ))
  return dict(encoder=encoder, decoder=decoder, latents=None,
              observation=observation, input_shape=input_shape)


def shapes3d_networks(qz: str = "mvndiag", zdim: Optional[int] = None,
                      **kwargs) -> Dict[str, Any]:
  """Shapes3D 64x64x3 (reference ``image_networks.py:560-658``) — same trunk
  as dsprites with 3 channels and 6 ground-truth factors."""
  kwargs.setdefault("n_channels", 3)
  kwargs.setdefault("n_factors", 6)
  return dsprites_networks(qz=qz, zdim=zdim, **kwargs)


shapes3dsmall_networks = shapes3d_networks
shapes3d0_networks = shapes3d_networks


def locatello_networks(qz: str = "mvndiag", zdim: Optional[int] = None,
                       **kwargs) -> Dict[str, Any]:
  """disentanglement_lib's EXACT conv trunk (Locatello et al. 2019;
  `conv_encoder`/`deconv_decoder` in dlib `shared/architectures.py`) —
  the architecture behind every published dSprites/Shapes3D benchmark
  number.  Differs from the reference's own 64x64 trunk
  (`dsprites_networks`) in: ReLU (not elu), encoder kernels 4-4-2-2 (not
  4-4-4-4), an fc-256 ReLU projection (not a linear 128), an
  fc-256 + fc-1024 ReLU decoder stem, and NO input centering (bernoulli
  likelihood on raw [0,1] pixels).  Used by the seed-spread trunk study
  (results/fullgrid/run_seed_spread.py --trunk dlib) to discriminate
  architecture-level from recipe-level score differences."""
  n_channels = int(kwargs.get("n_channels", 1))
  input_shape = (64, 64, n_channels)
  zdim = 10 if zdim is None else int(zdim)
  n_params, observation = _obs_distribution(
      input_shape, kwargs.get("distribution", "bernoulli"))
  encoder = SequentialNetwork((
      Conv(32, 4, 2, "relu"),   # 32, 32, 32
      Conv(32, 4, 2, "relu"),   # 16, 16, 32
      Conv(64, 2, 2, "relu"),   # 8, 8, 64
      Conv(64, 2, 2, "relu"),   # 4, 4, 64
      Flatten(),
      Dense(256, activation="relu"),
  ), name="encoder")
  decoder = _decoder_network((
      Dense(256, activation="relu"),
      Dense(1024, activation="relu"),
      Reshape((4, 4, 64)),
      ConvTranspose(64, 4, 2, "relu"),  # 8, 8, 64
      ConvTranspose(64, 4, 2, "relu"),  # 16, 16, 64
      ConvTranspose(32, 4, 2, "relu"),  # 32, 32, 32
      ConvTranspose(n_channels * n_params, 4, 2, None),  # 64, 64, C·n
      PackImageParams(n_params),
  ), kwargs.get("skip_generator", False))
  return dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=observation,
      input_shape=input_shape,
      hierarchy=(),
  )


def celeba_networks(qz: str = "mvndiag", zdim: Optional[int] = None,
                    **kwargs) -> Dict[str, Any]:
  """CelebA 64x64x3, 40 binary attributes
  (reference ``image_networks.py:661-729``)."""
  kwargs.setdefault("n_channels", 3)
  zdim = 45 if zdim is None else zdim
  nets = dsprites_networks(qz=qz, zdim=zdim, **{k: v for k, v in kwargs.items()
                                                if k != "n_factors"})
  if kwargs.get("is_semi_supervised", False):
    nets["labels"] = RVconf(int(kwargs.get("n_labels", 40)), "bernoulli",
                            projection=True, name="attributes")
  return nets


def halfmoons_networks(
    qz: str = "mvndiag",
    zdim: Optional[int] = None,
    activation: Union[str, Callable] = "relu",
    is_semi_supervised: bool = False,
    is_hierarchical: bool = False,
    **kwargs,
) -> Dict[str, Any]:
  """MLP networks for the 2-D half-moons toy set."""
  zdim = 2 if zdim is None else int(zdim)
  encoder = SequentialNetwork(
      tuple(Dense(64, activation) for _ in range(3)), name="encoder")
  decoder = SequentialNetwork(
      tuple(Dense(64, activation) for _ in range(3)), name="decoder")
  networks = dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=RVconf((2,), "gaussian", projection=True, name="moons"),
      input_shape=(2,),
      hierarchy=(),
  )
  if is_semi_supervised:
    networks["labels"] = RVconf(2, "onehot", projection=True, name="labels")
  return networks


def _gene_networks(
    input_dim: int,
    n_labels: int,
    qz: str = "mvndiag",
    zdim: Optional[int] = None,
    activation: Union[str, Callable] = "relu",
    is_semi_supervised: bool = False,
    is_hierarchical: bool = False,
    **kwargs,
) -> Dict[str, Any]:
  """Gene-expression MLPs with log-count normalization and ZINB likelihood
  (reference ``image_networks.py:732-904``)."""
  zdim = 10 if zdim is None else int(zdim)
  hidden = int(kwargs.get("hidden_dim", 128))
  encoder = SequentialNetwork(
      (LogNorm(),) + tuple(Dense(hidden, activation) for _ in range(2)),
      name="encoder")
  decoder = SequentialNetwork(
      tuple(Dense(hidden, activation) for _ in range(2)), name="decoder")
  networks = dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), qz, projection=True, name="latents"),
      observation=RVconf((input_dim,), kwargs.get("distribution", "zinbd"),
                         projection=True, name="genes"),
      input_shape=(input_dim,),
      hierarchy=(),
  )
  if is_semi_supervised:
    networks["labels"] = RVconf(n_labels, "onehot", projection=True,
                                name="celltype")
  return networks


cortex_networks = functools.partial(_gene_networks, input_dim=558, n_labels=7)
pbmc_networks = functools.partial(_gene_networks, input_dim=1000, n_labels=4)


_DSNAME_MAP = dict(halfmnist="mnist")


def get_networks(dataset_name,
                 *,
                 is_semi_supervised: bool = False,
                 is_hierarchical: bool = False,
                 qz: str = "mvndiag",
                 zdim: Optional[int] = None,
                 **kwargs) -> Dict[str, Any]:
  """Dispatch `<name>_networks` (reference ``image_networks.py:907-933``)."""
  if hasattr(dataset_name, "name"):
    dataset_name = dataset_name.name
  if zdim is not None and zdim <= 0:
    zdim = None
  name = str(dataset_name).lower().strip()
  name = _DSNAME_MAP.get(name, name)
  g = globals()
  for key, fn in g.items():
    if not key.endswith("_networks"):
      continue
    if key.split("_")[0] == name:
      return fn(qz=qz, zdim=zdim, is_semi_supervised=is_semi_supervised,
                is_hierarchical=is_hierarchical, **kwargs)
  raise ValueError(f"no pre-implemented network for dataset '{dataset_name}'")


def get_optimizer_info(dataset_name: str,
                       batch_size: int = 64) -> Dict[str, Any]:
  """Per-dataset training budget: max_iter + exponential-decay lr schedule
  (reference ``image_networks.py:936-1013``)."""
  name = str(dataset_name).strip().lower()
  name = _DSNAME_MAP.get(name, name)
  decay_rate, decay_steps, init_lr = 0.996, 10000, 1e-3
  if name == "halfmoons":
    n_epochs, n_samples = 200, 3200
  elif name == "mnist" or name == "binarizedmnist":
    n_epochs, n_samples = 800, 55000
  elif name == "fashionmnist":
    n_epochs, n_samples = 1000, 55000
  elif name == "omniglot":
    n_epochs, n_samples = 1000, 19280
  elif "svhn" in name:
    n_epochs, n_samples = 2000, 69594
  elif "cifar" in name:
    n_epochs, n_samples, init_lr = 2500, 48000, 5e-4
  elif "dsprites" in name:
    n_epochs, n_samples = 400, 663552
  elif "shapes3d" in name:
    n_epochs, n_samples, init_lr = (250 if "small" in name else 400), 432000, 2e-4
  elif "celeba" in name:
    n_epochs, n_samples, init_lr = (2000 if "small" in name else 3000), 162770, 2e-4
  elif "cortex" in name:
    n_epochs, n_samples, init_lr = 500, 5000, 1e-4
  elif "pbmc" in name:
    n_epochs, n_samples, init_lr = 500, 5000, 1e-4
  else:
    raise NotImplementedError(f"no optimizer info for dataset '{dataset_name}'")
  max_iter = int(n_samples / batch_size * n_epochs)
  lr = optax.exponential_decay(init_lr, transition_steps=decay_steps,
                               decay_rate=decay_rate, staircase=True)
  return dict(max_iter=max_iter, learning_rate=lr)
