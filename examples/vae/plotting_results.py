"""Aggregate and plot results across experiment runs (reference:
``examples/vae/plotting_results.py``): reads the jsonl training logs +
ScoreBoard tables under ./results and renders comparison learning curves
and metric bar charts into one multipage PDF.

Run::

  python examples/vae/plotting_results.py [results_dir] [out.pdf]
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, os.pardir))


def load_histories(results_dir):
  """-> {run_name: [record dict per step]} from every log.jsonl found."""
  runs = {}
  for path in sorted(glob.glob(os.path.join(results_dir, "**", "log.jsonl"),
                               recursive=True)):
    name = os.path.relpath(os.path.dirname(path), results_dir)
    with open(path) as f:
      rows = [json.loads(line) for line in f if line.strip()]
    if rows:
      runs[name] = rows
  return runs


def main(results_dir="./results", out_pdf=None):
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  from odin_tpu import visual

  runs = load_histories(results_dir)
  if not runs:
    print(f"no log.jsonl under {results_dir}")
    return
  # learning curves: one panel per metric, one line per run
  metrics = sorted({k for rows in runs.values() for k in rows[-1]
                    if isinstance(rows[-1][k], (int, float))
                    and k not in ("step", "time")})
  for metric in metrics:
    fig = plt.figure(figsize=(7, 4))
    for name, rows in runs.items():
      xs = [r.get("step", i) for i, r in enumerate(rows) if metric in r]
      ys = [r[metric] for r in rows if metric in r]
      if ys:
        plt.plot(xs, ys, label=name, alpha=0.8)
    plt.title(metric)
    plt.xlabel("step")
    plt.legend(fontsize=6)
    plt.tight_layout()
  # scoreboard tables, if any
  for db in glob.glob(os.path.join(results_dir, "**", "*.db",),
                      recursive=True):
    from odin_tpu.training.scores import ScoreBoard
    sb = ScoreBoard(db)
    for table in sb.tables():
      rows = sb.select(table)
      print(f"[{os.path.relpath(db, results_dir)}] {table}: {len(rows)} rows")
      for r in rows[:20]:
        print("   ", {k: v for k, v in r.items() if k != "timestamp"})
  out = out_pdf or os.path.join(results_dir, "comparison.pdf")
  visual.plot_save(out)
  print("saved:", out)


if __name__ == "__main__":
  main(*sys.argv[1:])
