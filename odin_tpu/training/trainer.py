"""Host-side training loop.

Reference: ``odin/training/trainer.py`` — `Trainer.fit` (:536): wraps the
optimize fn at a graph boundary, iterates batches with progress, periodic
logging + validation with metric averaging, callbacks returning dicts get
logged, `terminate()`, checkpoints.

TPU redesign: the compile boundary is a single jitted ``step_fn(state,
batch)``; the Trainer only moves host batches onto the mesh, pumps the loop,
logs, validates and checkpoints.  No tf.function / autograph machinery.
"""
from __future__ import annotations

import json
import os
import pickle
import sys
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from odin_tpu import parallel
from odin_tpu.training.core import TrainState

__all__ = ["Trainer", "get_current_trainer"]

_CURRENT_TRAINER: Optional["Trainer"] = None


def get_current_trainer() -> Optional["Trainer"]:
  """Reference ``trainer.py:850``."""
  return _CURRENT_TRAINER


def _to_float(tree):
  return {k: float(v) for k, v in tree.items()}


class Trainer:
  """Drive a jitted train step over a dataset.

  Args:
    logdir: directory for jsonl logs + checkpoints (and TensorBoard events
      when TF is importable).
  """

  def __init__(self,
               logdir: Optional[str] = None,
               logging_interval: float = 5.0,
               log_tag: str = "",
               use_tensorboard: bool = True):
    self.logdir = logdir
    if logdir is not None:
      os.makedirs(logdir, exist_ok=True)
    self.logging_interval = float(logging_interval)
    self.log_tag = log_tag
    self._terminate = False
    self.history: List[Dict[str, float]] = []
    self.valid_history: List[Dict[str, float]] = []
    self._log_file = None
    self._tb_writer = None
    self.use_tensorboard = use_tensorboard and logdir is not None
    self.last_metrics: Dict[str, float] = {}
    self.step = 0

  # -- logging --------------------------------------------------------------
  def _open_logs(self):
    if self.logdir is None:
      return
    if self._log_file is None:
      self._log_file = open(os.path.join(self.logdir, "log.jsonl"), "a")
    if self.use_tensorboard and self._tb_writer is None:
      try:
        import tensorflow as tf
        self._tb_writer = tf.summary.create_file_writer(self.logdir)
      except Exception:
        self._tb_writer = None

  def _log(self, metrics: Dict[str, float], step: int, prefix: str = "train"):
    rec = {"step": step, "time": time.time(), "tag": prefix, **metrics}
    (self.history if prefix == "train" else self.valid_history).append(rec)
    if self.logdir is not None:
      self._open_logs()
      self._log_file.write(json.dumps(rec) + "\n")
      self._log_file.flush()
      if self._tb_writer is not None:
        import tensorflow as tf
        with self._tb_writer.as_default(step=step):
          for k, v in metrics.items():
            tf.summary.scalar(f"{prefix}/{k}", v)
        self._tb_writer.flush()

  def terminate(self):
    """Stop training at the next step (reference ``trainer.py:476-478``)."""
    self._terminate = True

  # -- profiling --------------------------------------------------------------
  def trace(self, n_steps: int = 5):
    """Arm a jax.profiler trace of the next `n_steps` steps, written to
    `<logdir>/profile` (the TPU replacement for the reference's
    `tf.summary.trace_on`, ``trainer.py:722-732``)."""
    assert self.logdir is not None, "trace requires a logdir"
    self._trace_remaining = int(n_steps)
    return self

  # -- checkpoints ----------------------------------------------------------
  def save_checkpoint(self, state: TrainState, path: Optional[str] = None,
                      blocking: bool = True):
    """Single-artifact checkpoint of the full TrainState
    (replaces the reference's tf.train.CheckpointManager + pickled sidecars,
    ``trainer.py:211-342``).

    ``blocking=False`` makes the save non-blocking: the state is snapshotted
    with an on-device copy (cheap HBM traffic, and safe against the train
    loop donating the live buffers to the next step — `make_step_fn` uses
    ``donate_argnums=(0,)``), then the device->host transfer + pickle +
    atomic rename run on a writer thread while training keeps dispatching.
    One writer at a time; `wait_for_checkpoint()` joins it (fit() does this
    before returning, even when the loop raises).  Durability caveat: with
    ``blocking=False`` a save that has been *requested* at step N is not
    guaranteed on disk until the writer is joined — a hard crash (SIGKILL,
    power loss) between request and join can lose that one checkpoint."""
    path = path or os.path.join(self.logdir, "checkpoint")

    def _write(host_state):
      with open(path + ".tmp", "wb") as f:
        pickle.dump(host_state, f)
      os.replace(path + ".tmp", path)

    if blocking:
      _write(jax.device_get(state))
      return path
    snap = jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, state)
    self.wait_for_checkpoint()  # serialize writers (raises prior failures)
    import threading

    def _run():
      try:
        _write(jax.device_get(snap))
      except BaseException as e:  # surfaced by wait_for_checkpoint()
        self._ckpt_error = e

    self._ckpt_thread = threading.Thread(target=_run, daemon=True)
    self._ckpt_thread.start()
    return path

  def wait_for_checkpoint(self):
    """Join the in-flight non-blocking checkpoint writer, if any.

    Re-raises any exception the writer thread hit (pickle failure, disk
    full, ...) so a failed save never passes silently."""
    t = getattr(self, "_ckpt_thread", None)
    if t is not None:
      t.join()
      self._ckpt_thread = None
    err = getattr(self, "_ckpt_error", None)
    if err is not None:
      self._ckpt_error = None
      raise RuntimeError("async checkpoint write failed") from err

  def restore_checkpoint(self, path: Optional[str] = None) -> Optional[TrainState]:
    path = path or (os.path.join(self.logdir, "checkpoint") if self.logdir else None)
    if path is None or not os.path.exists(path):
      return None
    with open(path, "rb") as f:
      return pickle.load(f)

  def save_checkpoint_orbax(self, state: TrainState,
                            directory: Optional[str] = None,
                            step: Optional[int] = None):
    """Orbax checkpoint (async-capable, TPU-standard) of the TrainState."""
    import orbax.checkpoint as ocp
    directory = directory or os.path.join(os.path.abspath(self.logdir),
                                          "orbax")
    step = int(step if step is not None else jax.device_get(state.step))
    with ocp.CheckpointManager(directory) as mngr:
      mngr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
      mngr.wait_until_finished()
    return directory

  def restore_checkpoint_orbax(self, template: TrainState,
                               directory: Optional[str] = None,
                               step: Optional[int] = None) -> TrainState:
    import orbax.checkpoint as ocp
    directory = directory or os.path.join(os.path.abspath(self.logdir),
                                          "orbax")
    with ocp.CheckpointManager(directory) as mngr:
      step = int(step if step is not None else mngr.latest_step())
      return mngr.restore(step, args=ocp.args.StandardRestore(
          jax.device_get(template)))

  # -- main loop ------------------------------------------------------------
  def fit(self,
          train_ds,
          step_fn: Callable,
          state: TrainState,
          valid_ds=None,
          valid_interval: float = 0.0,
          valid_freq: int = 0,
          eval_fn: Optional[Callable] = None,
          max_iter: int = -1,
          callbacks: Sequence[Callable] = (),
          on_valid_end: Sequence[Callable] = (),
          checkpoint_freq: int = 0,
          mesh=None,
          steps_per_call: int = 1,
          verbose: bool = True) -> TrainState:
    """Run the loop; returns the final TrainState.

    `step_fn(state, batch) -> (state, metrics)` must already be jitted.
    `eval_fn(state, batch) -> metrics` evaluates a validation batch.
    `callbacks(trainer, state, metrics)` run per logging tick; dict returns
    get merged into the log (reference ``trainer.py:94-117``).
    `on_valid_end(trainer, state, valid_metrics)` may return a replacement
    TrainState (the early-stopping best-weight restore hook).
    """
    global _CURRENT_TRAINER
    _CURRENT_TRAINER = self
    mesh = mesh or parallel.default_mesh()
    state = parallel.replicate(state, mesh)
    self._terminate = False
    last_log = time.time()
    it = 0
    t_start = time.time()
    steps_since_log = 0
    k = max(int(steps_per_call), 1)
    if k > 1:
      # fuse k updates per device call (lax.scan) — amortizes dispatch
      # latency; batches are stacked on a new leading (scan) axis with the
      # data axis sharded
      import jax.numpy as _jnp
      from jax.sharding import NamedSharding, PartitionSpec as _P
      from odin_tpu.training.core import scan_steps
      inner = step_fn
      fused = jax.jit(scan_steps(inner, k), donate_argnums=(0,))

      def _stack_shard(batches):
        def _put(*xs):
          x = np.stack(xs)
          spec = [None] * x.ndim
          if x.ndim > 1:
            spec[1] = "data"
          return jax.device_put(x, NamedSharding(mesh, _P(*spec)))
        return jax.tree_util.tree_map(_put, *batches)

      def _iter_fused(ds):
        buf = []
        for b in ds:
          buf.append(b)
          if len(buf) == k:
            yield _stack_shard(buf)
            buf = []

      train_ds = _iter_fused(train_ds)
      step_fn = fused
    tracing = False
    try:
      for epoch in range(1 << 30):
        for batch in train_ds:
          if k == 1:
            batch = parallel.shard_batch(batch, mesh)
          if getattr(self, "_trace_remaining", 0) > 0 and not tracing:
            jax.profiler.start_trace(os.path.join(self.logdir, "profile"))
            tracing = True
          state, metrics = step_fn(state, batch)
          if tracing:
            self._trace_remaining -= k
            if self._trace_remaining <= 0:
              jax.block_until_ready(metrics)
              jax.profiler.stop_trace()
              tracing = False
          it += k
          steps_since_log += k
          now = time.time()
          if now - last_log >= self.logging_interval or it == max_iter or it == 1:
            m = _to_float(jax.device_get(metrics))
            m["steps_per_sec"] = steps_since_log / max(now - last_log, 1e-9)
            for cb in callbacks:
              out = cb(self, state, m)
              if isinstance(out, dict):
                m.update(_to_float(out))
            self.last_metrics = m
            self.step = it
            self._log(m, it)
            if verbose:
              msg = " ".join(f"{k}:{v:.4g}" for k, v in m.items())
              print(f"[{self.log_tag or 'train'}] #{it} {msg}", flush=True)
            last_log, steps_since_log = now, 0
            if m.get("nan_gradients", 0) > 0:
              print("[trainer] non-finite gradients — stopping", flush=True)
              self._terminate = True
          # validation
          if valid_ds is not None and eval_fn is not None and (
              (valid_freq > 0 and it % valid_freq == 0) or
              (valid_interval > 0 and now - getattr(self, "_last_valid", 0)
               >= valid_interval)):
            self._last_valid = now
            vm = self.validate(valid_ds, eval_fn, state, mesh)
            self._log(vm, it, prefix="valid")
            if verbose:
              msg = " ".join(f"{k}:{v:.4g}" for k, v in vm.items())
              print(f"[valid] #{it} {msg}", flush=True)
            for cb in on_valid_end:
              out = cb(self, state, vm)
              if isinstance(out, TrainState):
                state = out
          if checkpoint_freq > 0 and self.logdir and it % checkpoint_freq == 0:
            # non-blocking: snapshot on device, write on a thread — training
            # never stalls on checkpoint I/O
            self.save_checkpoint(state, blocking=False)
          if self._terminate or (0 < max_iter <= it):
            break
        if self._terminate or (0 < max_iter <= it):
          break
    finally:
      # join the async checkpoint writer even when the loop raises
      # (KeyboardInterrupt, iterator error) so the daemon thread is never
      # killed mid-write at interpreter exit; also surfaces writer errors —
      # but never REPLACE an exception already propagating (a Ctrl-C must
      # stay a KeyboardInterrupt for callers doing graceful shutdown)
      self.total_time = time.time() - t_start
      _CURRENT_TRAINER = None
      if sys.exc_info()[0] is None:
        self.wait_for_checkpoint()
      else:
        try:
          self.wait_for_checkpoint()
        except Exception as ckpt_err:
          print(f"[trainer] async checkpoint write failed during teardown: "
                f"{ckpt_err!r}", flush=True)
    # pull the final state to host: downstream host-facing use (encode/
    # decode/Gym, op-by-op) must not mix mesh-replicated params with
    # single-device inputs — that deadlocks XLA CPU collectives
    return jax.device_get(state)

  def validate(self, valid_ds, eval_fn, state, mesh=None) -> Dict[str, float]:
    """Average eval_fn metrics over the validation set
    (reference ``trainer.py:615-631``)."""
    mesh = mesh or parallel.default_mesh()
    totals: Dict[str, float] = {}
    n = 0
    for batch in valid_ds:
      batch = parallel.shard_batch(batch, mesh)
      m = jax.device_get(eval_fn(state, batch))
      for k, v in m.items():
        totals[k] = totals.get(k, 0.0) + float(v)
      n += 1
    return {k: v / max(n, 1) for k, v in totals.items()}

  # -- introspection --------------------------------------------------------
  def read_logs(self) -> List[Dict[str, float]]:
    """Parse log.jsonl back (replaces `read_tensorboard`,
    reference ``trainer.py:135-173``)."""
    path = os.path.join(self.logdir, "log.jsonl")
    out = []
    with open(path) as f:
      for line in f:
        out.append(json.loads(line))
    return out

  def plot_learning_curves(self, path: Optional[str] = None, smooth: float = 0.6):
    """EMA-smoothed learning curves (reference ``trainer.py:766-844``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    logs = self.history or self.read_logs()
    keys = sorted({k for rec in logs for k in rec
                   if k not in ("step", "time", "tag")})
    fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3.2),
                             squeeze=False)
    for ax, key in zip(axes[0], keys):
      xs = [r["step"] for r in logs if key in r]
      ys = [r[key] for r in logs if key in r]
      if smooth > 0 and len(ys) > 2:
        ema, out = ys[0], []
        for y in ys:
          ema = smooth * ema + (1 - smooth) * y
          out.append(ema)
        ax.plot(xs, ys, alpha=0.25)
        ax.plot(xs, out)
      else:
        ax.plot(xs, ys)
      ax.set_title(key)
    fig.tight_layout()
    path = path or os.path.join(self.logdir, "learning_curves.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
