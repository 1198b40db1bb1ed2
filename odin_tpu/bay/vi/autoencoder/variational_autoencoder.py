"""VariationalAutoencoder — the root of the VAE zoo.

Reference: ``odin/bay/vi/autoencoder/variational_autoencoder.py`` — four
parts encoder / latents / decoder / observation; `encode` (:288-314),
`decode` (:316-360), `call -> (px_z, qz_x)` (:362-394), `elbo_components`
(:515-542), `train_steps` yielding `VAEStep` (:545-558), `marginal_log_prob`
(:396-513), `sample_prior/sample_observation` (:266-286).

TPU redesign: the four parts are flax submodules of one `VAECore`; the model
object holds hyperparameters + a `TrainState` and compiles ONE pure step
function (all TrainSteps fused) per fit — the `tf.function` boundary of the
reference becomes a single jit with the batch sharded over the mesh.
"""
from __future__ import annotations

import copy
import os
import pickle
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu import parallel
from odin_tpu.bay.distributions import Distribution
from odin_tpu.bay.helpers import kl_divergence
from odin_tpu.bay.layers.dense_distribution import DistributionDense
from odin_tpu.bay.random_variable import RVconf
from odin_tpu.bay.vi._base import VariationalModel, traverse_dims
from odin_tpu.networks.base import SequentialNetwork
from odin_tpu.training.core import (
    TrainState,
    TrainStep,
    build_train_step_fn,
    make_optimizer,
)
from odin_tpu.training.trainer import Trainer

__all__ = ["VAECore", "VariationalAutoencoder", "VAE", "Autoencoder",
           "SemiSupervisedVAE"]


def _as_head(head, default_name: str) -> DistributionDense:
  if isinstance(head, RVconf):
    return head.create_posterior(name=default_name)
  if isinstance(head, nn.Module):
    # any module returning a Distribution works as a head (e.g. the
    # VectorQuantizer of VQ-VAE)
    return head
  raise ValueError(f"cannot interpret {head!r} as a distribution head")


class VAECore(nn.Module):
  """flax trunk: encoder -> latents head; decoder -> observation head.

  `labels_input` selects where the optional labels head attaches:
  'latents' (Skiptask-style) or 'decoder_hidden' (Multitask-style) — the
  choice must be fixed at init so the head's Dense resolves its input dim.
  """

  encoder: Any
  decoder: Any
  latents: DistributionDense
  observation: DistributionDense
  labels: Optional[DistributionDense] = None
  labels_input: str = "latents"

  def encode(self, x, training: bool = False):
    h = self.encoder(x, training=training)
    return self.latents(h, training=training)

  def encoder_hidden(self, x, training: bool = False):
    return self.encoder(x, training=training)

  def latents_from_hidden(self, h, training: bool = False):
    return self.latents(h, training=training)

  def observation_from_hidden(self, h, training: bool = False):
    return self.observation(h, training=training)

  def decode(self, z, training: bool = False):
    h = self.decoder(z, training=training)
    return self.observation(h, training=training)

  def decoder_hidden(self, z, training: bool = False):
    return self.decoder(z, training=training)

  def predict_labels(self, h, training: bool = False):
    return self.labels(h, training=training)

  def __call__(self, x, training: bool = False):
    qz = self.encode(x, training=training)
    z = qz.mean()
    h = self.decoder(z, training=training)
    px = self.observation(h, training=training)
    if self.labels is not None:
      self.predict_labels(z if self.labels_input == "latents" else h,
                          training=training)
    return px, qz


class VariationalAutoencoder(VariationalModel):
  """Vanilla VAE; subclasses override `elbo_components` / `train_steps`.

  Usage (API parity with the reference)::

    networks = get_networks('mnist')
    vae = BetaVAE(beta=10., **networks)
    vae.build()
    vae.fit(train, max_iter=10000)
    px, qz = vae(x)
  """

  def __init__(self,
               encoder: Any = None,
               decoder: Any = None,
               latents: Union[RVconf, DistributionDense] = None,
               observation: Union[RVconf, DistributionDense] = None,
               labels: Union[RVconf, DistributionDense, None] = None,
               input_shape: Optional[Tuple[int, ...]] = None,
               hierarchy: Sequence[dict] = (),
               analytic: bool = False,
               reverse: bool = True,
               free_bits: Optional[float] = None,
               sample_shape: Union[int, Tuple[int, ...]] = (),
               allow_negative_kl: bool = True,
               name: Optional[str] = None,
               **kwargs):
    super().__init__(analytic=analytic, reverse=reverse, free_bits=free_bits,
                     sample_shape=sample_shape,
                     allow_negative_kl=allow_negative_kl, name=name)
    if latents is None:
      latents = RVconf(32, "mvndiag", projection=True, name="latents")
    if observation is None and input_shape is not None:
      observation = RVconf(tuple(input_shape), "gaussian", projection=True,
                           name="observation")
    if encoder is None:
      from odin_tpu.networks.base import Dense
      encoder = SequentialNetwork(tuple(Dense(64, "relu") for _ in range(2)),
                                  name="encoder")
    if decoder is None:
      from odin_tpu.networks.base import Dense
      decoder = SequentialNetwork(tuple(Dense(64, "relu") for _ in range(2)),
                                  name="decoder")
    self.encoder_net = encoder
    self.decoder_net = decoder
    self.latents_conf = latents if isinstance(latents, RVconf) else None
    self.observation_conf = observation if isinstance(observation, RVconf) else None
    self.labels_conf = labels if isinstance(labels, RVconf) else None
    self.latents_head = _as_head(latents, "latents")
    self.observation_head = _as_head(observation, "observation")
    self.labels_head = _as_head(labels, "labels") if labels is not None else None
    self.input_shape = tuple(input_shape) if input_shape is not None else None
    self.hierarchy = tuple(hierarchy)
    self.core = self._build_core()
    self.state: Optional[TrainState] = None
    self.step = 0
    # priors are built EAGERLY (outside any trace) so their parameter arrays
    # are constants, never leaked tracers
    self._priors: Dict[str, Distribution] = {}
    _ = self.latents_prior

  # -- construction ---------------------------------------------------------
  def _build_core(self) -> nn.Module:
    labels_input = "latents" if getattr(self, "skip_decoder", True) \
        else "decoder_hidden"
    return VAECore(encoder=self.encoder_net, decoder=self.decoder_net,
                   latents=self.latents_head,
                   observation=self.observation_head,
                   labels=self.labels_head,
                   labels_input=labels_input)

  def extra_networks(self) -> Dict[str, Tuple[nn.Module, Callable]]:
    """Additional top-level modules (name -> (module, dummy-input fn)),
    each becoming its own params partition (e.g. FactorVAE's
    discriminator)."""
    return {}

  @property
  def zdim(self) -> int:
    return int(np.prod(self.latents_head.event_shape))

  @property
  def latents_prior(self) -> Distribution:
    if "latents" not in self._priors:
      prior = (self.latents_conf.create_prior()
               if self.latents_conf is not None else self.latents_head.prior)
      self._priors["latents"] = prior
    return self._priors["latents"]

  def build(self,
            input_shape: Optional[Tuple[int, ...]] = None,
            seed: int = 1) -> "VariationalAutoencoder":
    """Initialize parameters (reference keras `build`)."""
    if input_shape is not None:
      self.input_shape = tuple(i for i in input_shape if i is not None)
    assert self.input_shape is not None, "input_shape must be provided"
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1,) + self.input_shape, jnp.float32)
    k_core, k_extra = jax.random.split(rng)
    variables = self.core.init(
        {"params": k_core, "dropout": k_core, "sample": k_core}, x)
    params = {"vae": variables["params"]}
    mutables = {k: v for k, v in variables.items() if k != "params"}
    for pname, (module, dummy_fn) in self.extra_networks().items():
      k_extra, k = jax.random.split(k_extra)
      v = module.init({"params": k, "dropout": k}, dummy_fn())
      params[pname] = v["params"]
    self.state = TrainState(
        params=params,
        opt_states={},
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed + 1),
        mutables=mutables,
    )
    return self

  # -- pure apply helpers ---------------------------------------------------
  def _apply(self, params: Dict[str, Any], method: str, *args,
             rng: Optional[jax.Array] = None, training: bool = False,
             mutables: Optional[Dict] = None):
    variables = {"params": params["vae"], **(mutables or {})}
    rngs = {}
    if rng is not None:
      r1, r2 = jax.random.split(rng)
      rngs = {"dropout": r1, "sample": r2}
    return self.core.apply(variables, *args, training=training,
                           method=getattr(self.core, method), rngs=rngs)

  def _apply_module(self, params: Dict[str, Any], name: str, module: nn.Module,
                    *args, rng: Optional[jax.Array] = None,
                    training: bool = False, method=None):
    """Apply an extra top-level module (its own params partition)."""
    rngs = {}
    if rng is not None:
      rngs = {"dropout": rng}
    return module.apply({"params": params[name]}, *args, training=training,
                        rngs=rngs, **({} if method is None else
                                      {"method": method}))

  def _params_of(self) -> Dict[str, Any]:
    assert self.state is not None, "call build() first"
    return self.state.params

  # -- the reference's public API -------------------------------------------
  def encode(self, x, params: Optional[Dict] = None, training: bool = False,
             seed: int = 0, jit: bool = True) -> Distribution:
    """x -> qz (reference :288-314).  Jitted (and cached) by default —
    distributions are pytrees, so they cross the jit boundary intact; on a
    remote-attached chip the op-by-op path costs one round trip per op."""
    params = params or self._params_of()
    mut = self.state.mutables if self.state else {}
    if jit and not training:
      if not hasattr(self, "_encode_jit"):
        self._encode_jit = jax.jit(
            lambda p, x, rng, m: self._apply(p, "encode", x, rng=rng,
                                             training=False, mutables=m))
      return self._encode_jit(params, jnp.asarray(x),
                              jax.random.PRNGKey(seed), mut)
    return self._apply(params, "encode", jnp.asarray(x),
                       rng=jax.random.PRNGKey(seed), training=training,
                       mutables=mut)

  def decode(self, z, params: Optional[Dict] = None, training: bool = False,
             seed: int = 0, jit: bool = True) -> Distribution:
    """z -> px (reference :316-360); flattens MCMC sample dims."""
    params = params or self._params_of()
    z = jnp.asarray(z)
    mut = self.state.mutables if self.state else {}
    if jit and not training:
      if not hasattr(self, "_decode_jit"):
        self._decode_jit = jax.jit(
            lambda p, z, rng, m: self._apply(p, "decode", z, rng=rng,
                                             training=False, mutables=m))
      decode_fn = lambda zz: self._decode_jit(params, zz,
                                              jax.random.PRNGKey(seed), mut)
    else:
      decode_fn = lambda zz: self._apply(
          params, "decode", zz, rng=jax.random.PRNGKey(seed),
          training=training, mutables=mut)
    extra_dims = z.ndim - 2
    if extra_dims > 0:  # (S..., B, zdim) -> (S*B, zdim)
      lead = z.shape[:-1]
      px = decode_fn(z.reshape(-1, z.shape[-1]))
      return px, lead
    return decode_fn(z)

  def __call__(self, x, training: bool = False, seed: int = 0):
    """x -> (px, qz) (reference :362-394)."""
    qz = self.encode(x, training=training, seed=seed)
    z = qz.sample(jax.random.PRNGKey(seed))
    px = self.decode(z, training=training, seed=seed)
    return px, qz

  def reconstruct(self, x, params: Optional[Dict] = None, seed: int = 0):
    """x -> (qz, px) through the posterior path (encode -> mean z ->
    decode), each leg a cached jitted call.

    This is the evaluation surface the DisentanglementGym batches over;
    subclasses whose decode needs posterior-side state (hierarchical
    ladders) override it so evaluation matches the training path."""
    qz = self.encode(x, params=params, seed=seed)
    px = self.decode(qz.mean(), params=params, seed=seed)
    return qz, px

  def sample_prior(self, n: int = 1, seed: int = 0) -> jax.Array:
    """Sample z ~ p(z) (reference :266-275)."""
    return self.latents_prior.sample(jax.random.PRNGKey(seed), (n,))

  def sample_observation(self, n: int = 1, seed: int = 0) -> Distribution:
    """Sample z ~ p(z), decode to px (reference :276-286)."""
    z = self.sample_prior(n, seed)
    return self.decode(z, seed=seed)

  def sample_traverse(self, x, feature_indices=None, min_val=-2.0,
                      max_val=2.0, n_traverse_points: int = 11,
                      mode: str = "linear", seed: int = 0):
    """Encode x, sweep latent dims, decode the grid
    (reference ``_base.py:326-383``)."""
    qz = self.encode(x, seed=seed)
    z = qz.mean()
    zt = traverse_dims(z, feature_indices, min_val, max_val,
                       n_traverse_points, mode)
    return self.decode(zt, seed=seed)

  # -- ELBO -----------------------------------------------------------------
  def elbo_components(self, params, batch, rng, step,
                      training: bool = False, mutables=None):
    """-> (llk dict, kl dict) (reference :515-542)."""
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    qz = self._apply(params, "encode", x, rng=k1, training=training,
                     mutables=mutables)
    z = qz.sample(k2, self.sample_shape)
    if self.sample_shape:
      z_flat = z.reshape((-1, z.shape[-1]))
      px = self._apply(params, "decode", z_flat, rng=k1, training=training,
                       mutables=mutables)
      llk_s = px.log_prob(jnp.tile(
          x, (int(np.prod(self.sample_shape)),) + (1,) * (x.ndim - 1)))
      llk_x = llk_s.reshape(self.sample_shape + (-1,)).mean(
          axis=tuple(range(len(self.sample_shape))))
    else:
      px = self._apply(params, "decode", z, rng=k1, training=training,
                       mutables=mutables)
      llk_x = px.log_prob(x)
    obs_name = getattr(self.observation_head, "name", None) or "observation"
    llk = {f"llk_{obs_name}": llk_x}
    kl_z = kl_divergence(qz, self.latents_prior, analytic=self.analytic,
                         q_sample=z if not self.analytic else None,
                         reverse=self.reverse, free_bits=self.free_bits)
    lat_name = getattr(self.latents_head, "name", None) or "latents"
    kl = {f"kl_{lat_name}": kl_z}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)

  @staticmethod
  def _split_inputs(batch):
    if isinstance(batch, (tuple, list)):
      x = batch[0]
      y = batch[1] if len(batch) > 1 else None
    elif isinstance(batch, dict):
      x = batch.get("inputs", batch.get("x"))
      y = batch.get("labels", batch.get("y"))
    else:
      x, y = batch, None
    return x, y

  # -- training -------------------------------------------------------------
  def _vae_loss(self, params, batch, rng, step, mutables):
    llk, kl, aux = self.elbo_components(params, batch, rng, step,
                                        training=True, mutables=mutables)
    elbo = self.elbo(llk, kl)
    loss = -jnp.mean(elbo)
    metrics = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
    return loss, (metrics, mutables)

  def train_steps(self) -> List[TrainStep]:
    """Reference :545-558 — one VAEStep for the plain VAE."""
    return [TrainStep(loss_fn=self._vae_loss, partitions=("vae",), name="vae")]

  def optimizer_specs(self) -> Dict[str, Dict[str, Any]]:
    """Per-partition optimizer overrides; subclass hook
    (e.g. FactorVAE's discriminator Adam)."""
    return {}

  def make_step_fn(self,
                   optimizer: str = "adam",
                   learning_rate: Union[float, Callable] = 1e-3,
                   clipnorm: Optional[float] = None,
                   global_clipnorm: Optional[float] = None,
                   nan_policy: str = "skip",
                   train_params: Optional[Sequence[str]] = None,
                   accum_steps: int = 1,
                   compute_dtype=None,
                   ema_decay: Optional[float] = None,
                   remat: Union[bool, str] = False,
                   keep_opt_states: bool = False,
                   jit: bool = True, **opt_kwargs):
    """Build (and jit) the fused multi-TrainStep update function; also
    initializes optimizer states on self.state.

    `train_params` restricts optimization to the given param paths
    ('/'-separated into the nested tree, e.g. ``('vae/decoder',)`` trains
    the decoder with everything else frozen — reference
    `encoder.trainable = False`, ``betavae_encoder_info_bound.py:130``).
    Only valid for single-TrainStep models.

    `accum_steps` — gradient accumulation over microbatches;
    `compute_dtype` — mixed precision (e.g. ``jnp.bfloat16`` compute with
    fp32 master weights); `ema_decay` — Polyak-averaged params tracked in
    the state (read via `training.core.use_ema_params`); `remat` —
    recompute activations in the backward pass (`jax.checkpoint`; True or
    a `jax.checkpoint_policies` name) to trade FLOPs for HBM.  See
    `training.core.build_train_step_fn`."""
    assert self.state is not None, "call build() first"
    specs = self.optimizer_specs()
    steps = self.train_steps()
    if train_params is not None:
      assert len(steps) == 1, \
          "train_params override requires a single-TrainStep model"
      import dataclasses as _dc
      steps = [_dc.replace(steps[0], partitions=tuple(train_params))]
    optimizers = {}
    for ts in steps:
      opt_name = ts.optimizer or ts.partitions[0]
      spec = specs.get(opt_name, {})
      optimizers[opt_name] = make_optimizer(
          spec.get("optimizer", optimizer),
          spec.get("learning_rate", learning_rate),
          clipnorm=spec.get("clipnorm", clipnorm),
          global_clipnorm=spec.get("global_clipnorm", global_clipnorm),
          **{**opt_kwargs, **spec.get("kwargs", {})})
    # keep_opt_states=True resumes from checkpointed optimizer moments
    # (crash/stall recovery in long runs); missing partitions still init
    opt_states = dict(self.state.opt_states) \
        if keep_opt_states and self.state.opt_states else {}
    for ts in steps:
      opt_name = ts.optimizer or ts.partitions[0]
      if opt_name not in opt_states:
        from odin_tpu.training.core import extract_partitions
        sub = extract_partitions(self.state.params, ts.partitions)
        opt_states[opt_name] = optimizers[opt_name].init(sub)
    if ema_decay is not None:
      from odin_tpu.training.core import EMA_KEY
      opt_states[EMA_KEY] = self.state.params
    self.state = self.state.replace(opt_states=opt_states)
    fn = build_train_step_fn(steps, optimizers, nan_policy=nan_policy,
                             accum_steps=accum_steps,
                             compute_dtype=compute_dtype,
                             ema_decay=ema_decay, remat=remat)
    return jax.jit(fn, donate_argnums=(0,)) if jit else fn

  def make_eval_fn(self, jit: bool = True):
    def eval_fn(state: TrainState, batch):
      llk, kl, _ = self.elbo_components(state.params, batch,
                                        jax.random.PRNGKey(0), state.step,
                                        training=False,
                                        mutables=state.mutables)
      elbo = self.elbo(llk, kl)
      m = {k: jnp.mean(v) for k, v in {**llk, **kl}.items()}
      m["elbo"] = jnp.mean(elbo)
      m["loss"] = -m["elbo"]
      return m
    return jax.jit(eval_fn) if jit else eval_fn

  def fit(self,
          train,
          valid=None,
          max_iter: int = 1000,
          optimizer: str = "adam",
          learning_rate: Union[float, Callable] = 1e-3,
          valid_freq: int = 0,
          valid_interval: float = 0.0,
          logdir: Optional[str] = None,
          logging_interval: float = 5.0,
          callbacks: Sequence[Callable] = (),
          on_valid_end: Sequence[Callable] = (),
          checkpoint_freq: int = 0,
          nan_policy: str = "skip",
          clipnorm: Optional[float] = None,
          global_clipnorm: Optional[float] = None,
          steps_per_call: int = 1,
          verbose: bool = True,
          **opt_kwargs) -> Trainer:
    """Train (reference `Networks.fit`, ``base_networks.py:642-812``).

    `steps_per_call > 1` fuses that many optimizer updates into one device
    call via lax.scan (large speedup for small steps; logging/validation
    then happen at steps_per_call granularity)."""
    if self.state is None:
      batch0 = next(iter(train))
      x0, _ = self._split_inputs(batch0)
      self.build(input_shape=np.shape(x0)[1:])
    step_fn = self.make_step_fn(optimizer=optimizer,
                                learning_rate=learning_rate,
                                clipnorm=clipnorm,
                                global_clipnorm=global_clipnorm,
                                nan_policy=nan_policy,
                                jit=steps_per_call <= 1, **opt_kwargs)
    eval_fn = self.make_eval_fn() if valid is not None else None
    trainer = Trainer(logdir=logdir, logging_interval=logging_interval,
                      log_tag=self.name)
    self.trainer = trainer
    self.state = trainer.fit(train, step_fn, self.state, valid_ds=valid,
                             valid_freq=valid_freq,
                             valid_interval=valid_interval, eval_fn=eval_fn,
                             max_iter=max_iter, callbacks=callbacks,
                             on_valid_end=on_valid_end,
                             checkpoint_freq=checkpoint_freq,
                             steps_per_call=steps_per_call, verbose=verbose)
    self.step = int(jax.device_get(self.state.step))
    return trainer

  def fit_device_dataset(self,
                         X,
                         n_steps: int = 10000,
                         batch_size: int = 256,
                         learning_rate: Union[float, Callable] = 1e-3,
                         optimizer: str = "adam",
                         steps_per_call: int = 1000,
                         seed: int = 0,
                         verbose: bool = True,
                         sample_fn: Optional[Callable] = None,
                         keep_opt_states: bool = False,
                         checkpoint_path: Optional[str] = None,
                         checkpoint_freq: int = 0,
                         **opt_kwargs) -> "VariationalAutoencoder":
    """Train with the ENTIRE dataset device-resident and batches sampled on
    device — zero per-step host traffic (see
    `training.core.device_dataset_steps`).  The fastest path for corpora
    that fit in HBM (dSprites: ~0.3 GB)."""
    import time as _time
    if self.state is None:
      x0 = X[0] if not isinstance(X, (tuple, list)) else X[0][0]
      self.build(input_shape=np.shape(x0))
    from odin_tpu.training.core import device_dataset_steps
    raw = self.make_step_fn(optimizer=optimizer,
                            learning_rate=learning_rate, jit=False,
                            keep_opt_states=keep_opt_states, **opt_kwargs)
    # X may be a pytree (x, y, mask) for semi-supervised families
    data = jax.device_put(
        jax.tree_util.tree_map(jnp.asarray,
                               tuple(X) if isinstance(X, (tuple, list))
                               else X))
    state = parallel.replicate(self.state)
    k = min(int(steps_per_call), int(n_steps))
    fused = jax.jit(device_dataset_steps(raw, int(batch_size), k,
                                         seed=seed, sample_fn=sample_fn),
                    donate_argnums=(0,))
    done = 0
    last_ckpt = 0
    t0 = _time.time()
    while done < n_steps:
      state, metrics = fused(state, data)
      done += k
      if verbose:
        m = {key: float(v) for key, v in jax.device_get(metrics).items()}
        rate = done / (_time.time() - t0)
        print(f"[{self.name}] #{done} " +
              " ".join(f"{key}:{v:.4g}" for key, v in m.items()) +
              f" steps_per_sec:{rate:.1f}", flush=True)
      # periodic full-state checkpoints WITHOUT leaving the compiled loop
      # (a tunnel stall mid-run then loses at most checkpoint_freq steps;
      # the pickle holds params + optimizer moments + step, so
      # load_weights + keep_opt_states=True resumes exactly)
      if (checkpoint_path and checkpoint_freq > 0 and
          (done - last_ckpt >= checkpoint_freq or done >= n_steps)):
        host = jax.device_get(state)
        with open(checkpoint_path + ".tmp", "wb") as f:
          pickle.dump(host, f)
        os.replace(checkpoint_path + ".tmp", checkpoint_path)
        last_ckpt = done
        if verbose:
          print(f"[{self.name}] checkpoint @ step {int(host.step)} -> "
                f"{checkpoint_path}", flush=True)
    self.state = jax.device_get(state)
    self.step = int(self.state.step)
    return self

  # -- marginal log prob ----------------------------------------------------
  def marginal_log_prob(self, x, n_samples: int = 50, seed: int = 0,
                        batch_size: Optional[int] = None):
    """Importance-sampled log p(x) ≈ log 1/S Σ p(x|z)p(z)/q(z|x)
    (reference :396-513).  Returns (marginal llk, reconstruction llk)."""
    params = self._params_of()
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def one_batch(x, key):
      qz = self._apply(params, "encode", x, rng=key)
      z = qz.sample(key, (n_samples,))  # (S, B, zdim)
      zf = z.reshape(-1, z.shape[-1])
      px = self._apply(params, "decode", zf, rng=key)
      lp_x = px.log_prob(jnp.tile(x, (n_samples,) + (1,) * (x.ndim - 1)))
      lp_x = lp_x.reshape(n_samples, -1)
      lp_z = self.latents_prior.log_prob(z)
      lq_z = qz.log_prob(z)
      iw = self.importance_weighted(lp_x + lp_z - lq_z, axis=0)
      rec = jnp.mean(lp_x, axis=0)
      return iw, rec

    x = jnp.asarray(x)
    if batch_size is None:
      return one_batch(x, key)
    iws, recs = [], []
    for i in range(0, x.shape[0], batch_size):
      iw, rec = one_batch(x[i:i + batch_size], jax.random.fold_in(key, i))
      iws.append(iw)
      recs.append(rec)
    return jnp.concatenate(iws), jnp.concatenate(recs)

  # -- persistence ----------------------------------------------------------
  def save_weights(self, path: str):
    """Pickle the TrainState (reference ``base_networks.py:338-390``)."""
    assert self.state is not None
    with open(path, "wb") as f:
      pickle.dump(jax.device_get(self.state), f)

  def load_weights(self, path: str):
    with open(path, "rb") as f:
      self.state = pickle.load(f)
    self.step = int(self.state.step)
    return self

  def md5_checksum(self) -> str:
    """md5 of all weights (reference ``base_networks.py:853-861``)."""
    from odin_tpu.utils import md5_checksum as _md5
    leaves = jax.tree_util.tree_leaves(jax.device_get(self.state.params))
    return _md5(np.concatenate([np.asarray(l).ravel() for l in leaves]))

  def __repr__(self):
    return (f"{type(self).__name__}(zdim={self.zdim}, "
            f"input_shape={self.input_shape}, step={self.step})")


VAE = VariationalAutoencoder


class SemiSupervisedVAE(VariationalAutoencoder):
  """Semi-supervised base (reference ``variational_autoencoder.py:606``):
  marks the class semi-supervised and provides the uns/sup objective
  merging + empty-labelled-batch masking the reference mixin carried.
  Concrete semi-supervised models (M2VAE, MultitaskVAE, SemafoVAE,
  SemiFactorVAE, ...) implement the same contract via the
  `is_semi_supervised` classmethod; this class exists for users
  subclassing the reference surface directly."""

  @classmethod
  def is_semi_supervised(cls) -> bool:
    return True

  @staticmethod
  def ignore_empty(is_empty, loss_dict):
    """Zero every loss term when the labelled sub-batch is empty
    (reference :613-620); jit-safe via where instead of cond."""
    return {k: jnp.where(is_empty, jnp.zeros_like(v), v)
            for k, v in loss_dict.items()}

  @staticmethod
  def merge_objectives(llk_uns, kl_uns, llk_sup, kl_sup):
    """Prefix-merge unsupervised and supervised objective dicts
    (reference :622-632)."""
    llk = {**{f"uns/{k}": v for k, v in llk_uns.items()},
           **{f"sup/{k}": jnp.mean(v) for k, v in llk_sup.items()}}
    kl = {**{f"uns/{k}": v for k, v in kl_uns.items()},
          **{f"sup/{k}": jnp.mean(v) for k, v in kl_sup.items()}}
    return llk, kl


class Autoencoder(VariationalAutoencoder):
  """Deterministic autoencoder baseline
  (reference ``odin/bay/vi/autoencoder/deterministic.py:105``)."""

  def __init__(self, latents=None, **kwargs):
    if latents is None:
      latents = RVconf(32, "vdeterministic", projection=True, name="latents")
    elif isinstance(latents, RVconf):
      latents = latents.copy(posterior="vdeterministic")
    super().__init__(latents=latents, **kwargs)

  def elbo_components(self, params, batch, rng, step, training=False,
                      mutables=None):
    x, y = self._split_inputs(batch)
    k1, k2 = jax.random.split(rng)
    qz = self._apply(params, "encode", x, rng=k1, training=training,
                     mutables=mutables)
    z = qz.mean()
    px = self._apply(params, "decode", z, rng=k1, training=training,
                     mutables=mutables)
    llk = {"llk_observation": px.log_prob(x)}
    kl = {"kl_latents": jnp.zeros(z.shape[0])}
    return llk, kl, dict(qz=qz, px=px, z=z, x=x, y=y)
