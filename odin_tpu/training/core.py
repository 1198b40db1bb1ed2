"""Training-step machinery: TrainState, TrainStep, optimizer building.

Reference: ``odin/networks/base_networks.py`` — `TrainStep` (:129),
`Networks.optimize` (:415,490-624: per-step GradientTape over a parameter
partition, NaN-gradient policies, clipping, skip-update threshold) and
`Networks.fit`'s optimizer-from-alias construction (:642-812).

TPU redesign: the whole multi-step optimize is ONE pure function
``(state, batch, rng) -> (state, metrics)`` — jitted once, sharded by the
caller (params replicated, batch split on the 'data' mesh axis; XLA inserts
the gradient psum).  Parameter partitions are top-level keys of the params
dict (e.g. ``{'vae': ..., 'discriminator': ...}``), each with its own optax
optimizer — the functional equivalent of the reference's multi-optimizer
`train_steps` dispatch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import flax
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "TrainStep", "make_optimizer", "build_train_step_fn",
           "scan_steps", "device_dataset_steps",
           "multiseed_device_dataset_steps", "stack_states", "unstack_states",
           "get_param_subtree", "set_param_subtree", "extract_partitions",
           "merge_partitions", "use_ema_params", "EMA_KEY"]


@flax.struct.dataclass
class TrainState:
  """Pure training state: one pytree holding everything a step touches,
  checkpointable as a unit (replaces the reference's three overlapping
  checkpoint systems, SURVEY.md §5)."""

  params: Dict[str, Any]
  opt_states: Dict[str, Any]
  step: jax.Array
  rng: jax.Array
  mutables: Dict[str, Any] = flax.struct.field(default_factory=dict)
  skipped_updates: jax.Array = flax.struct.field(
      default_factory=lambda: jnp.zeros((), jnp.int32))


@dataclasses.dataclass
class TrainStep:
  """One optimization stage inside a training iteration.

  Attributes:
    loss_fn: ``(params, batch, rng, step, mutables) -> (loss, (metrics,
      mutables))`` pure function; `params` is the FULL params dict (so a
      stage can read frozen partitions), gradients are taken only w.r.t.
      `partitions`.
    partitions: params keys this step optimizes.  Each entry is either a
      top-level key (``'vae'``) or a '/'-separated path into the nested
      param tree (``'vae/decoder'``) — the latter freezes every sibling
      subtree, e.g. a decoder-only finetune with the encoder held fixed
      (reference `encoder.trainable = False`,
      ``examples/vae/betavae_encoder_info_bound.py:130-134``).
    optimizer: name of the optimizer (key into the optimizers dict);
      defaults to the first partition name.
  """

  loss_fn: Callable
  partitions: Tuple[str, ...] = ("params",)
  optimizer: Optional[str] = None
  name: str = "step"


def get_param_subtree(params, path: str):
  """Walk a '/'-separated path into a nested params dict."""
  node = params
  for k in str(path).split("/"):
    node = node[k]
  return node


def set_param_subtree(params, path: str, value):
  """Functionally replace the subtree at `path`, re-building only the
  dicts along the way (no mutation of the input tree)."""
  keys = str(path).split("/")

  def rec(node, i):
    if i == len(keys):
      return value
    out = dict(node)
    out[keys[i]] = rec(node[keys[i]], i + 1)
    return out

  return rec(params, 0)


def extract_partitions(params, partitions: Sequence[str]) -> Dict[str, Any]:
  """{path: subtree} for each partition path (the grad-bearing leaves)."""
  return {p: get_param_subtree(params, p) for p in partitions}


def merge_partitions(params, sub: Dict[str, Any]):
  """Write each {path: subtree} back into the full params tree."""
  for p, v in sub.items():
    params = set_param_subtree(params, p, v)
  return params


_OPT_ALIASES = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "adamax": optax.adamax,
    "lamb": optax.lamb,
    "lion": optax.lion,
    "nadam": optax.nadam,
}


def make_optimizer(name: Union[str, optax.GradientTransformation] = "adam",
                   learning_rate: Union[float, Callable] = 1e-3,
                   clipnorm: Optional[float] = None,
                   global_clipnorm: Optional[float] = None,
                   clipvalue: Optional[float] = None,
                   **kwargs) -> optax.GradientTransformation:
  """Optimizer from alias + clipping options (mirrors `_to_optimizer`,
  reference ``base_networks.py:85-112`` and the clipnorm handling at
  :579-596)."""
  if isinstance(name, optax.GradientTransformation):
    opt = name
  else:
    key = str(name).lower()
    if key not in _OPT_ALIASES:
      raise ValueError(f"unknown optimizer '{name}'; available: {sorted(_OPT_ALIASES)}")
    opt = _OPT_ALIASES[key](learning_rate, **kwargs)
  chain = []
  if clipvalue is not None:
    chain.append(optax.clip(clipvalue))
  if clipnorm is not None:
    chain.append(optax.clip_by_block_rms(clipnorm))
  if global_clipnorm is not None:
    chain.append(optax.clip_by_global_norm(global_clipnorm))
  chain.append(opt)
  return optax.chain(*chain) if len(chain) > 1 else opt


def _cast_floats(tree, dtype):
  """Cast every floating leaf of a pytree to `dtype` (ints/bools pass)."""

  def cast(x):
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
      return x.astype(dtype)
    return x

  return jax.tree_util.tree_map(cast, tree)


EMA_KEY = "__ema__"


def use_ema_params(state: TrainState) -> TrainState:
  """State with params swapped for their exponential moving average
  (requires the step fn to have been built with ``ema_decay``).  Polyak-
  averaged weights are the standard eval/serving weights for generative
  models; no counterpart in the reference (its best-weights registry,
  ``trainer.py:182-208``, keeps raw snapshots)."""
  if EMA_KEY not in state.opt_states:
    raise ValueError("no EMA tracked: build the step fn with ema_decay=...")
  return state.replace(params=state.opt_states[EMA_KEY])


def build_train_step_fn(
    train_steps: Sequence[TrainStep],
    optimizers: Dict[str, optax.GradientTransformation],
    nan_policy: str = "skip",
    accum_steps: int = 1,
    compute_dtype: Optional[Any] = None,
    ema_decay: Optional[float] = None,
    remat: Union[bool, str] = False,
) -> Callable:
  """Compose TrainSteps into one pure ``(state, batch) -> (state, metrics)``.

  `nan_policy` (reference `nan_gradients_policy`, ``base_networks.py:520-578``):
    'skip'   — drop the update when any gradient is non-finite and count it;
    'apply'  — always apply (debugging);
    'stop'   — like skip, plus emits metrics['nan_gradients']=1 so the host
               Trainer can halt/restore.

  `accum_steps > 1` — gradient accumulation: the batch's leading axis is
  split into `accum_steps` microbatches, per-microbatch gradients are
  averaged in a lax.scan (activations for only ONE microbatch live at a
  time — the standard way to train an N-times-larger effective batch in
  the same HBM), then each optimizer applies a single update.  For
  mean-reduced losses this is numerically the full-batch gradient (held
  by ``tests/test_vae_core.py::test_grad_accumulation_matches_full_batch``).

  `compute_dtype` (e.g. ``jnp.bfloat16``) — mixed-precision policy: params
  and batch are cast to the compute dtype INSIDE the loss (so the forward/
  backward runs on the MXU's native bf16 path) while master params,
  gradients, and optimizer moments stay fp32 (the cast's VJP casts
  gradients back up).  bf16 shares fp32's exponent range, so no loss
  scaling is needed (unlike fp16).

  `ema_decay` (e.g. 0.999) — track a Polyak average of the FULL params
  tree in ``opt_states['__ema__']`` (so it checkpoints/restores with the
  state), updated once per fused step; read with `use_ema_params`.

  `remat` — gradient rematerialization (`jax.checkpoint`): the backward
  pass recomputes forward activations instead of keeping them resident in
  HBM, trading FLOPs for memory — the standard TPU lever when activations
  exceed HBM/VMEM (the measured batch-scaling knee past batch 128,
  BASELINE.md).  ``True`` stores no intermediate activations (maximal
  memory saving, maximal recompute); a string or policy callable names a
  `jax.checkpoint_policies` policy, e.g.
  ``'dots_with_no_batch_dims_saveable'`` to keep matmul outputs (cheaper
  recompute, smaller saving).  Numerically identical to the plain step
  (same primitives re-executed) — held by
  ``tests/test_vae_core.py::test_remat_step_matches_plain``.  No reference
  counterpart (TF's `recompute_grad` is never used there).  Composes with
  `accum_steps` (remat inside each microbatch) and `compute_dtype`.
  """
  train_steps = list(train_steps)
  accum_steps = int(accum_steps)
  if remat and not isinstance(remat, bool):
    if callable(remat):  # an actual jax.checkpoint policy callable
      remat_policy = remat
    elif isinstance(remat, str):
      remat_policy = getattr(jax.checkpoint_policies, remat, None)
      if remat_policy is None:
        valid = sorted(n for n in dir(jax.checkpoint_policies)
                       if not n.startswith("_"))
        raise ValueError(
            f"unknown remat policy {remat!r}; valid names: {valid}")
    else:
      raise ValueError(
          f"remat must be bool, str, or a checkpoint-policy callable; "
          f"got {type(remat).__name__}")
  else:
    remat_policy = None

  def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
    metrics: Dict[str, jax.Array] = {}
    params = dict(state.params)
    opt_states = dict(state.opt_states)
    mutables = state.mutables
    rng = state.rng
    skipped = state.skipped_updates
    any_nan = jnp.zeros((), jnp.bool_)
    for i, ts in enumerate(train_steps):
      rng, step_rng = jax.random.split(rng)
      sub = extract_partitions(params, ts.partitions)

      def loss_of(sub_params, mb=batch, mb_rng=step_rng, mut=None,
                  params=params, ts=ts):
        mut = mutables if mut is None else mut
        full = merge_partitions(params, sub_params)
        if compute_dtype is not None:
          full = _cast_floats(full, compute_dtype)
          mb = _cast_floats(mb, compute_dtype)
        return ts.loss_fn(full, mb, mb_rng, state.step, mut)

      grad_target = (jax.checkpoint(loss_of, policy=remat_policy)
                     if remat else loss_of)

      if accum_steps > 1:
        micro = jax.tree_util.tree_map(
            lambda a: a.reshape((accum_steps, a.shape[0] // accum_steps)
                                + a.shape[1:]), batch)
        mb_keys = jax.random.split(step_rng, accum_steps)

        def body(carry, xs, sub=sub):
          g_acc, mut = carry
          mb, k = xs
          (mb_loss, (mb_metrics, mut)), g = jax.value_and_grad(
              grad_target, has_aux=True)(sub, mb, k, mut)
          g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
          ys = (mb_loss.astype(jnp.float32),
                jax.tree_util.tree_map(
                    lambda v: jnp.asarray(v, jnp.float32), mb_metrics))
          return (g_acc, mut), ys

        (g_sum, mutables), (losses, mets) = jax.lax.scan(
            body, (jax.tree_util.tree_map(jnp.zeros_like, sub), mutables),
            (micro, mb_keys))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, g_sum)
        loss = jnp.mean(losses)
        step_metrics = jax.tree_util.tree_map(
            lambda v: jnp.mean(v, axis=0), mets)
      else:
        (loss, (step_metrics, mutables)), grads = jax.value_and_grad(
            grad_target, has_aux=True)(sub)
        loss = loss.astype(jnp.float32)
        step_metrics = jax.tree_util.tree_map(
            lambda v: jnp.asarray(v, jnp.float32), step_metrics)
      opt_name = ts.optimizer or ts.partitions[0]
      updates, new_opt = optimizers[opt_name].update(
          grads, opt_states[opt_name], sub)
      new_sub = optax.apply_updates(sub, updates)
      finite = jnp.all(jnp.asarray(
          [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
      )) if nan_policy in ("skip", "stop") else jnp.asarray(True)
      any_nan = jnp.logical_or(any_nan, ~finite)
      # select old vs new atomically per step
      new_sub = jax.tree_util.tree_map(
          lambda new, old: jnp.where(finite, new, old), new_sub, sub)
      new_opt = jax.tree_util.tree_map(
          lambda new, old: jnp.where(finite, new, old), new_opt,
          opt_states[opt_name])
      params = merge_partitions(params, new_sub)
      opt_states[opt_name] = new_opt
      prefix = f"{ts.name}/" if len(train_steps) > 1 else ""
      metrics[f"{prefix}loss"] = loss
      for k, v in step_metrics.items():
        metrics[f"{prefix}{k}"] = v
    skipped = skipped + any_nan.astype(jnp.int32)
    if nan_policy == "stop":
      metrics["nan_gradients"] = any_nan.astype(jnp.float32)
    if ema_decay is not None:
      d = jnp.float32(ema_decay)
      opt_states[EMA_KEY] = jax.tree_util.tree_map(
          lambda e, p: d * e + (1.0 - d) * p, opt_states[EMA_KEY], params)
    new_state = TrainState(
        params=params,
        opt_states=opt_states,
        step=state.step + 1,
        rng=rng,
        mutables=mutables,
        skipped_updates=skipped,
    )
    return new_state, metrics

  return step_fn


def scan_steps(step_fn: Callable, n_steps: int) -> Callable:
  """Fuse `n_steps` optimizer updates into ONE compiled call via lax.scan.

  ``(state, batches) -> (state, last_metrics)`` where `batches` has a
  leading axis of length `n_steps`.  This amortizes per-step dispatch
  latency — on a remote-attached TPU the host->device round trip dominates
  small conv-VAE steps, so scanning k steps per call multiplies throughput
  by up to k (the standard epoch-in-jit technique; no counterpart in the
  single-step-per-session reference, ``odin/training/trainer.py:634``).
  """

  def fused(state, batches):
    def body(s, batch):
      s, metrics = step_fn(s, batch)
      return s, metrics

    state, metrics = jax.lax.scan(body, state, batches)
    # report the LAST step's metrics (cheapest; means need a second pass)
    last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
    return state, last

  return fused


def _dequantize(a):
  # corpora may sit in HBM as uint8 (e.g. the full 737k dSprites grid is
  # 2.9 GB uint8 vs 11.6 GB fp32): cast per BATCH after the gather, so
  # only batch_size images ever exist in fp32
  if a.dtype == jnp.uint8:
    return a.astype(jnp.float32) / 255.0
  return a


def device_dataset_steps(step_fn: Callable, batch_size: int,
                         n_steps: int, seed: int = 0,
                         sample_fn: Optional[Callable] = None) -> Callable:
  """Fuse `n_steps` updates whose batches are SAMPLED ON DEVICE from a
  device-resident dataset — zero host->device traffic per step.

  Returns ``fused(state, data) -> (state, last_metrics)``; `data` is an
  array (or pytree of arrays with a shared leading axis) already placed on
  the device/mesh and MUST be passed as an argument (a closure capture
  would be baked into the compiled program as a constant — megabytes to
  gigabytes of HLO).  Each scan step draws a uniform random batch (with
  replacement) keyed by the global step counter, so resuming reproduces
  the same stream.  This is how small/medium corpora (dSprites fits in a
  fraction of HBM) should train on TPU: the host dispatches one call per
  `n_steps` with zero per-step traffic.

  `sample_fn(key, data) -> batch` overrides the default uniform gather —
  e.g. paired weak-supervision batches gathered from (grid, pair_indices)
  structures whose leaves have different leading axes.
  """
  data_key = jax.random.PRNGKey(seed)

  def fused(state, data):
    n = None if sample_fn is not None else \
        jax.tree_util.tree_leaves(data)[0].shape[0]

    def body(s, _):
      key = jax.random.fold_in(data_key, s.step)
      if sample_fn is not None:
        batch = sample_fn(key, data)
      else:
        idx = jax.random.randint(key, (batch_size,), 0, n)
        batch = jax.tree_util.tree_map(lambda a: _dequantize(a[idx]), data)
      s, metrics = step_fn(s, batch)
      return s, metrics

    state, metrics = jax.lax.scan(body, state, None, length=n_steps)
    last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
    return state, last

  return fused


def stack_states(states: Sequence[TrainState]) -> TrainState:
  """Stack per-seed TrainStates leaf-wise into one (S, ...) state pytree
  for `multiseed_device_dataset_steps`."""
  return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked: TrainState) -> List[TrainState]:
  """Split a stacked (S, ...) TrainState back into per-seed states."""
  n = int(stacked.step.shape[0])
  return [jax.tree_util.tree_map(lambda a: a[i], stacked) for i in range(n)]


def multiseed_device_dataset_steps(step_fn: Callable, batch_size: int,
                                   n_steps: int, seeds: Sequence[int],
                                   sample_fn: Optional[Callable] = None,
                                   ) -> Callable:
  """Train S INDEPENDENT model replicas in ONE compiled program.

  TPU-native multi-seed training: published disentanglement results are
  seed distributions (Locatello et al. 2019 train 50 seeds per recipe),
  and the conv-VAE step at reference width uses a fraction of the MXU
  (BASELINE.md: 16.9% MFU, conv-bound) — so instead of S sequential runs
  (S remote compiles + S wall-clocks), `jax.vmap` over a stacked
  `TrainState` batches all S models' convolutions into the same kernels.
  One compile, one dispatch stream, S results.  No counterpart in the
  reference (one process trains one model there).

  Each lane draws its OWN batch stream: lane i's per-step key is
  ``fold_in(PRNGKey(seeds[i]), state.step)`` — the KEYS (and hence batch
  indices) are bit-identical to a single-model
  `device_dataset_steps(seed=seeds[i])` run.  The trained params are
  numerically equivalent within float tolerance, not bitwise: vmapped conv
  kernels need not match the unvmapped compile bit-for-bit
  (tests/test_multiseed.py pins atol=1e-5).

  Returns ``fused(stacked_state, data) -> (stacked_state, last_metrics)``
  where `stacked_state` comes from `stack_states` and every metric leaf
  gains a leading (S,) axis.  `data` is shared (NOT stacked) across lanes.
  """
  seed_keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])

  def fused(stacked_state, data):
    n = None if sample_fn is not None else \
        jax.tree_util.tree_leaves(data)[0].shape[0]

    def body(stack, _):
      def one(state, skey):
        key = jax.random.fold_in(skey, state.step)
        if sample_fn is not None:
          batch = sample_fn(key, data)
        else:
          idx = jax.random.randint(key, (batch_size,), 0, n)
          batch = jax.tree_util.tree_map(lambda a: _dequantize(a[idx]), data)
        return step_fn(state, batch)

      return jax.vmap(one, in_axes=(0, 0))(stack, seed_keys)

    stacked, metrics = jax.lax.scan(body, stacked_state, None,
                                    length=n_steps)
    last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
    return stacked, last

  return fused
