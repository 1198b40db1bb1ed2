"""Support packages: experimenter, scoreboard, stats, visual, explain."""
import os

import numpy as np
import pytest

from odin_tpu.training import ScoreBoard, hash_config, parse_config, run_hydra
from odin_tpu.stats import (describe, freqcount, sampling_iter,
                            train_valid_test_split)
from odin_tpu.visual import (Visualizer, plot_animation,
                             plot_comparison_series, plot_confusion_matrix,
                             plot_det_curve, plot_heatmap, plot_images,
                             plot_save, plot_series, print_confusion,
                             print_dist)


def test_run_hydra_multirun(tmp_path):
  calls = []

  @run_hydra(output_dir=str(tmp_path), config={"lr": 1e-3, "model": "vae"})
  def main(cfg):
    calls.append((cfg.lr, cfg.model, cfg.output_dir))
    return cfg.lr

  out = main(["lr=0.01,0.001", "model=beta"])
  assert out == [0.01, 0.001]
  assert len({c[2] for c in calls}) == 2  # distinct output dirs
  assert all(c[1] == "beta" for c in calls)
  # config parsing + stable hash
  assert parse_config("x: 3\ny: true") == {"x": 3, "y": True}
  assert hash_config({"a": 1}) == hash_config({"a": 1})
  assert hash_config({"a": 1}) != hash_config({"a": 2})


def _grid_task(cfg):
  """Module-level so the fork pool can pickle it."""
  marker = os.path.join(cfg.output_dir, "ran.txt")
  with open(marker, "w") as f:
    f.write(f"{cfg.lr},{cfg.beta}")
  return (cfg.lr, cfg.beta)


def test_run_hydra_parallel_grid_and_reset(tmp_path):
  """Reference `-j N` multirun over a 2x2 override grid + `--reset`
  (``experimenter.py:245-446``; VERDICT r1 #8)."""
  wrapped = run_hydra(output_dir=str(tmp_path))(_grid_task)
  out = wrapped(["lr=0.1,0.01", "beta=1,4", "-j2"])
  assert sorted(out) == [(0.01, 1), (0.01, 4), (0.1, 1), (0.1, 4)]
  run_dirs = [d for d in os.listdir(tmp_path)
              if os.path.isdir(tmp_path / d)]
  assert len(run_dirs) == 4
  for d in run_dirs:
    assert os.path.exists(tmp_path / d / "ran.txt")
  # --reset wipes each run dir before re-running
  stale = tmp_path / run_dirs[0] / "stale.txt"
  stale.write_text("old")
  wrapped(["lr=0.1,0.01", "beta=1,4", "--reset"])
  assert not stale.exists()
  for d in run_dirs:
    assert os.path.exists(tmp_path / d / "ran.txt")


def test_scoreboard(tmp_path):
  sb = ScoreBoard(str(tmp_path / "scores.db"))
  sb.write("results", unique=["model"], model="vae", mig=0.1)
  sb.write("results", unique=["model"], model="vae", mig=0.3)  # replace
  sb.write("results", model="beta", mig=0.2, notes={"k": 1})
  rows = sb.select("results", order_by="mig")
  assert [(r["model"], r["mig"]) for r in rows] == [("beta", 0.2),
                                                    ("vae", 0.3)]
  assert sb.select("results", where={"model": "vae"})[0]["mig"] == 0.3
  assert "results" in sb.tables()
  assert sb.select("missing_table") == []


def test_stats_helpers():
  tr, va, te = train_valid_test_split(list(range(100)), train=0.6, seed=2)
  assert (len(tr), len(va), len(te)) == (60, 20, 20)
  assert not set(tr) & set(va) and not set(va) & set(te)
  # group-disjoint split
  items = [(i, i % 10) for i in range(100)]
  tr2, va2, te2 = train_valid_test_split(items, train=0.6,
                                         idfunc=lambda t: t[1], seed=2)
  groups = lambda s: {g for _, g in s}
  assert not groups(tr2) & groups(va2)
  assert freqcount("abbccc") == {"a": 1, "b": 2, "c": 3}
  assert len(sampling_iter(range(1000), 7)) == 7
  assert "mu=4.5" in describe(np.arange(10.0), shorten=True)


def test_visual(tmp_path):
  plot_images(np.random.rand(4, 8, 8, 1), title="x")
  plot_heatmap(np.random.randn(3, 4), annotate=True)
  from odin_tpu.backend import det_curve
  s = np.r_[np.random.randn(50) + 1, np.random.randn(50)]
  l = np.r_[np.ones(50), np.zeros(50)]
  plot_det_curve(*det_curve(l, s)[:2])
  p = plot_save(str(tmp_path / "f.pdf"))
  assert os.path.getsize(p) > 1000
  out = print_dist({"a": 3, "b": 1})
  assert "###" in out
  cm = print_confusion(np.eye(3))
  assert "1" in cm
  v = Visualizer()
  v.add_figure("h", plot_heatmap(np.eye(2)).figure)
  assert os.path.exists(v.save_figures(str(tmp_path / "v.pdf")))
  # statistical series + smoothing + multi-run band
  plot_series(np.random.rand(50), smooth=0.8, title="loss")
  plot_series({"a": np.random.rand(30), "b": np.random.rand(30, 4)})
  plot_comparison_series({"beta": [3, 2, 1], "factor": [3, 1, 0.5]},
                         baseline="beta")
  ax = plot_confusion_matrix(np.array([[5, 1], [2, 9]]), labels=["x", "y"])
  assert ax is not None
  gif = plot_animation(np.random.rand(4, 8, 8), str(tmp_path / "a.gif"))
  assert os.path.getsize(gif) > 100
  # GMM overlays / hinton / stacked feature panels / fig2data
  from odin_tpu.visual import (fig2data, plot_gaussian_mixture, plot_hinton,
                               plot_multiple_features)
  plot_gaussian_mixture(np.random.randn(200), means=[-1.0, 1.0],
                        sigmas=[0.5, 0.5], weights=[0.5, 0.5])
  ax = plot_gaussian_mixture(np.random.randn(200, 2),
                             means=np.zeros((2, 2)),
                             sigmas=np.stack([np.eye(2)] * 2))
  h = plot_hinton(np.random.randn(4, 5))
  fig = plot_multiple_features({"mel": np.random.rand(40, 24),
                                "energy": np.random.rand(40)})
  arr = fig2data(h.figure)
  assert arr.ndim == 3 and arr.shape[-1] == 4 and arr.dtype == np.uint8
  assert ax is not None and fig is not None
  # small figure helpers
  from odin_tpu.visual import (data2fig, plot_close, plot_colorbar,
                               plot_figure, plot_frame, plot_indices,
                               plot_vline)
  f = plot_figure(4, 6)
  assert tuple(f.get_size_inches()) == (6.0, 4.0)
  ax2 = plot_vline([2.0, 5.0])
  plot_indices(np.array([1, 3, 4]), x=np.random.randn(8), ax=ax2)
  plot_colorbar("magma", vmin=-1, vmax=1, ax=ax2, label="z")
  plot_frame(ax2, top=False, right=False)
  assert not ax2.spines["top"].get_visible()
  data2fig(arr)
  plot_close()
  from odin_tpu.visual import _FIGURES
  assert len(_FIGURES) == 0


def test_visual_extended(tmp_path):
  """Long-tail plotting surface (reference stats/heatmap/scatter/histogram
  plot modules + bashplot + animation)."""
  from odin_tpu.visual import (
      Animation, check_arg_length, ctext, generate_palette_colors,
      generate_random_colormaps, generate_random_colors,
      generate_random_marker, merge_figures, plot_Cnorm, plot_aspect,
      plot_close, plot_distance_heatmap, plot_gridSpec, plot_gridSubplot,
      plot_histogram_layers, plot_relative_series, plot_scatter_layers,
      plot_scatter_text, plot_series_statistics, plot_title, plot_to_image,
      plot_weights, plot_weights3D, plot_weights4D, print_bar, print_hinton,
      print_scatter, resize_images, tile_raster_images, time_ticks)
  rng = np.random.RandomState(0)
  # palettes / args
  cols = generate_random_colors(5)
  assert len(cols) == 5 and all(c.startswith("#") for c in cols)
  assert len(generate_random_colormaps(3)) == 3
  assert len(generate_palette_colors(25)) == 25
  assert len(set(generate_random_marker(6))) == 6
  assert check_arg_length("x", 3) == ["x", "x", "x"]
  # rasters
  tile = tile_raster_images(rng.rand(5, 8, 8))
  assert tile.ndim == 2 and tile.shape[0] > 8
  ctile = tile_raster_images(rng.rand(4, 8, 8, 3), images_per_row=2)
  assert ctile.shape == (17, 17, 3)
  rz = resize_images(rng.rand(6, 8, 8, 1), (16, 16))
  assert rz.shape == (6, 16, 16, 1)
  # statistical series
  obs, exp = rng.randn(200), rng.randn(200)
  ax, handles, idx = plot_series_statistics(
      observed=obs, expected=exp, total_stdev=1.0, explained_stdev=0.5,
      return_handles=True, return_indices=True, title="ppc")
  assert len(handles) >= 2 and len(idx) == 200
  assert np.all(np.diff(exp[idx]) >= 0)  # sorted by expected
  plot_relative_series(rng.rand(3, 5), row_name=["base", "a", "b"],
                       col_name=list("vwxyz"))
  from odin_tpu.visual import plot_comparison_track
  plot_comparison_track([[1, 2, 3], [2, 1, 0]], legends=["s1", "s2"],
                        tick_labels=["t1", "t2", "t3"])
  # heatmap family
  plot_Cnorm(rng.rand(2, 4), labels=list("abcd"), Ptrue=[0.1, 0.5])
  plot_weights(rng.randn(6, 6), cbar=True)
  plot_weights3D(rng.randn(5, 5, 7))
  plot_weights4D(rng.randn(3, 3, 2, 4))
  X = np.concatenate([rng.randn(10, 4), rng.randn(10, 4) + 5])
  y = np.r_[np.zeros(10), np.ones(10)]
  plot_distance_heatmap(X, labels=y, metric="cosine")
  # scatter / histogram layers
  plot_scatter_text(rng.randn(20, 2), marker=list("ab") * 10,
                    val=rng.rand(20))
  plot_scatter_layers([(rng.randn(30), rng.randn(30), rng.rand(30))] * 2,
                      layer_name=["p", "q"])
  plot_histogram_layers([rng.randn(100), rng.randn(100) + 2],
                        layer_name=["a", "b"], range_0_1=True)
  # figure management
  fig, gs = plot_gridSpec(2, 2)
  sub = plot_gridSubplot((2, 2), (0, 1))
  assert sub is not None
  plot_title("t", ax=sub)
  plot_aspect("equal", ax=sub)
  img = plot_to_image(fig)
  assert img.ndim == 4 and img.shape[0] == 1 and img.dtype == np.uint8
  m = merge_figures([plot_weights(rng.randn(3, 3)).figure,
                     plot_weights(rng.randn(3, 3)).figure])
  assert m is not None
  ax = plot_title("ticks")
  time_ticks(np.linspace(0, 120, 50), n_ticks=4, time_fmt="m", ax=ax)
  assert len(ax.get_xticklabels()) == 4
  # terminal plots
  assert "\x1b[31m" in ctext("hot", "red")
  out = print_bar(rng.randn(500), height=6)
  assert "o" in out
  out = print_scatter(rng.rand(40), rng.rand(40), size=8)
  assert "o" in out and "+" in out
  out = print_hinton(rng.randn(4, 6))
  assert len(out.splitlines()) == 4
  # animation builder
  anim = Animation().plot_images(rng.rand(4, 8, 8))
  anim.plot_spectrogram(rng.rand(4, 20, 12))
  assert len(anim) == 2
  gif = anim.save(str(tmp_path / "anim.gif"), fps=2)
  assert os.path.getsize(gif) > 100
  plot_close()


@pytest.mark.slow
def test_explain():
  from odin_tpu.networks import get_networks
  from odin_tpu.bay.vi import BetaVAE
  from odin_tpu.explain import AdversarialAttack, DeepDream, fgsm_attack
  vae = BetaVAE(**get_networks("halfmoons", zdim=2)).build()
  X = np.random.RandomState(0).rand(8, 2).astype("f")
  adv = AdversarialAttack(vae, epsilon=0.05).attack(X)
  assert adv.shape == X.shape
  delta = np.abs(adv - X)
  assert delta.max() <= 0.05 + 1e-6 and delta.max() > 0
  dd = DeepDream(lambda x: vae.encode(x).mean(), n_steps=3).dream(X)
  assert dd.shape == X.shape


def test_utils_reference_surface():
  """Progbar/ArgController/stdio/cache_memory/system-status exports
  (reference odin/utils grab-bag)."""
  import io
  import sys

  from odin_tpu.utils import (ArgController, Progbar, cache_memory,
                              get_datasetpath, get_exppath,
                              get_process_status, get_system_status, stdio)

  calls = []

  @cache_memory
  def f(a, b=1):
    calls.append((a, b))
    return a + b

  assert f(1) == 2 and f(1) == 2 and len(calls) == 1
  assert f(1, b=2) == 3 and len(calls) == 2
  f.cache_clear()
  assert f(1) == 2 and len(calls) == 3

  st = get_system_status()
  assert "cpu_count" in st
  ps = get_process_status()
  assert "pid" in ps
  assert isinstance(get_datasetpath(), str)
  assert isinstance(get_exppath(), str)
  # Progbar smoke
  pb = Progbar(target=10, name="t", print_report=False)
  for _ in range(10):
    pb.add(1)


def test_scoreboard_string_unique():
  """unique='name' (a single string key) must not be iterated char-wise."""
  import tempfile

  from odin_tpu.training.scores import ScoreBoard

  with tempfile.TemporaryDirectory() as d:
    sb = ScoreBoard(os.path.join(d, "s.db"))
    sb.write("runs", unique="name", name="a", elbo=-90.5)
    sb.write("runs", unique="name", name="a", elbo=-85.0, replace=True)
    rows = sb.select("runs")
    assert len(rows) == 1 and abs(rows[0]["elbo"] + 85.0) < 1e-6


def test_read_tensorboard_and_callback():
  import json
  import tempfile

  from odin_tpu.training import Callback, read_tensorboard

  with tempfile.TemporaryDirectory() as d:
    with open(os.path.join(d, "log.jsonl"), "w") as f:
      for s in range(3):
        f.write(json.dumps({"step": s, "loss": 10.0 - s, "time": 0.0}) + "\n")
    tags = read_tensorboard(d)
    assert tags["loss"] == [(0, 10.0), (1, 9.0), (2, 8.0)]
    assert "time" not in tags

  class Stop(Callback):
    def on_valid_end(self, trainer, state, valid_metrics):
      return {"flag": 1.0}

  assert Stop()(None, None, {}) == {"flag": 1.0}


def test_utils_long_tail_helpers():
  """Reference odin/utils long tail: uuid (:399), iter_chunk (:179),
  dict_union (:1084), ordered_set (:1073), segment_list (mpi.py:337),
  UniqueHasher (:444), classproperty/Singleton/select_path/get_all_files
  (python_utils), catch_warnings_ignore."""
  import warnings
  from odin_tpu.utils import (Singleton, UniqueHasher,
                              catch_warnings_ignore, classproperty,
                              dict_union, get_all_ext, get_all_files,
                              iter_chunk, ordered_set, read_lines,
                              segment_list, select_path, uuid)
  assert len(uuid(12)) == 12 and uuid() != uuid()
  assert list(iter_chunk(range(7), 3)) == [[0, 1, 2], [3, 4, 5], [6]]
  assert dict_union({"a": 1}, {"b": 2}, c=3) == {"a": 1, "b": 2, "c": 3}
  with pytest.raises(ValueError):
    dict_union({"a": 1}, {"a": 2})
  assert ordered_set([3, 1, 3, 2, 1]) == [3, 1, 2]
  segs = segment_list(list(range(10)), n_seg=4)
  assert len(segs) == 4 and sum(segs, []) == list(range(10))
  h = UniqueHasher(nb_labels=4)
  ids = [h.hash(v) for v in "abcd"]
  assert len(set(ids)) == 4 and h.hash("a") == ids[0]
  with pytest.raises(ValueError):
    h.hash("e")

  class One(metaclass=Singleton):
    pass

  assert One() is One()

  class B:
    @classproperty
    def tag(cls):
      return cls.__name__

  assert B.tag == "B"
  with warnings.catch_warnings():
    warnings.simplefilter("error")
    with catch_warnings_ignore(UserWarning):
      warnings.warn("x", UserWarning)
  import tempfile, os
  d = tempfile.mkdtemp()
  open(os.path.join(d, "a.txt"), "w").write("hi\n\nthere\n")
  assert read_lines(os.path.join(d, "a.txt")) == ["hi", "there"]
  assert get_all_files(d) == [os.path.join(d, "a.txt")]
  assert get_all_ext(d) == [".txt"]
  assert select_path("/nonexistent", d) == d


def test_remat_policy_validation():
  """ADVICE r2: a typo'd remat policy name must raise a ValueError listing
  valid `jax.checkpoint_policies` names (not an opaque AttributeError), and
  policy callables must be accepted as-is."""
  import jax
  from odin_tpu.training.core import build_train_step_fn
  with pytest.raises(ValueError, match="dots_saveable"):
    build_train_step_fn([], {}, remat="no_such_policy")
  with pytest.raises(ValueError, match="bool, str"):
    build_train_step_fn([], {}, remat=123)
  # callables pass through without error at build time
  build_train_step_fn([], {}, remat=jax.checkpoint_policies.dots_saveable)


def test_async_checkpoint_error_propagates(tmp_path):
  """ADVICE r2 (medium): exceptions on the async checkpoint writer thread
  must surface from wait_for_checkpoint(), not vanish."""
  from odin_tpu.training.trainer import Trainer
  tr = Trainer(logdir=str(tmp_path), use_tensorboard=False)
  unpicklable = {"params": (lambda x: x)}  # lambdas don't pickle
  tr.save_checkpoint(unpicklable, blocking=False)
  with pytest.raises(RuntimeError, match="async checkpoint"):
    tr.wait_for_checkpoint()
  # the error is consumed: a later good save works
  tr.save_checkpoint({"params": np.zeros(3)}, blocking=False)
  tr.wait_for_checkpoint()
  assert tr.restore_checkpoint() is not None


def test_fit_teardown_keeps_original_exception(tmp_path):
  """A failed async checkpoint writer must not REPLACE an exception already
  propagating out of the fit loop (e.g. KeyboardInterrupt): the finally
  block logs the writer error instead of raising over it."""
  from odin_tpu.training.trainer import Trainer
  tr = Trainer(logdir=str(tmp_path), use_tensorboard=False)

  def step_fn(state, batch):
    return state, {"loss": np.float32(0.0)}

  def bad_iter():
    # queue a checkpoint that will fail on the writer thread, then raise
    tr.save_checkpoint({"params": (lambda x: x)}, blocking=False)
    yield np.zeros((8, 4), "f")
    raise KeyboardInterrupt

  with pytest.raises(KeyboardInterrupt):
    tr.fit(bad_iter(), step_fn, {"params": np.zeros(3)}, max_iter=10,
           verbose=False)
  # the writer error was consumed during teardown, not left pending
  tr.wait_for_checkpoint()


def test_progbar_epoch_reports():
  """Per-key epoch history surface (reference `progbar.py:90,266,389`):
  history, get_report, set_summarizer, summary, add_notification."""
  from odin_tpu.utils import Progbar
  from odin_tpu.utils.progbar import add_notification as module_notify

  pb = Progbar(target=4, name="demo", print_report=False)
  pb.set_summarizer("acc", lambda vals: max(vals))
  for epoch in range(2):
    for i in range(4):
      pb.add(1, loss=float(10 * epoch + i), acc=float(i) / 10)
  assert pb.nb_epoch == 3  # two finished epochs + the fresh one
  assert pb.epoch_idx == 2
  # raw history per epoch
  assert pb.history[0]["loss"] == [0.0, 1.0, 2.0, 3.0]
  assert pb.get_report(epoch=1, key="loss") == [10.0, 11.0, 12.0, 13.0]
  # -1 = last finished epoch
  assert pb.get_report(-1)["loss"] == [10.0, 11.0, 12.0, 13.0]
  # epoch summaries: mean for plain scalars, custom summarizer for 'acc'
  assert pb._epoch_summary[0]["loss"] == 1.5
  assert pb._epoch_summary[1]["acc"] == 0.3
  s = pb.summary
  assert "Epoch 0" in s and "Epoch 1" in s and "loss" in s
  # notifications don't raise and return self for chaining
  assert pb.add_notification("hello") is pb
  module_notify("world")
  # report() falls back to the last finished epoch after rollover
  assert pb.report()["loss"] == 11.5
  # numpy-array values are summed per epoch
  pb2 = Progbar(target=2, print_report=False)
  pb2.add(1, conf=np.array([1.0, 2.0]))
  pb2.add(1, conf=np.array([3.0, 4.0]))
  np.testing.assert_allclose(pb2._epoch_summary[0]["conf"], [4.0, 6.0])
