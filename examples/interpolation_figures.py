"""Gallery of every interpolation / easing schedule in
`odin_tpu.backend.interpolation` — plain [0, 1] curves and the cyclical
warm-up/plateau/cool-down form used for KL annealing
(reference: ``examples/interpolation_figures.py``).
"""
import numpy as np

CONFIG = dict(n_points=250)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import matplotlib
  matplotlib.use("Agg")
  from matplotlib import pyplot as plt
  from odin_tpu.backend import interpolation
  from odin_tpu import visual as V

  all_interp = [getattr(interpolation, name) for name in interpolation.__all__
                if isinstance(getattr(interpolation, name), type)
                and issubclass(getattr(interpolation, name),
                               interpolation.Interpolation)
                and getattr(interpolation, name)
                is not interpolation.Interpolation]
  n_col = 5
  n_row = int(np.ceil(len(all_interp) / n_col))

  x = np.linspace(0.0, 1.0, num=cfg["n_points"]).astype("float32")
  fig = plt.figure(figsize=(n_col * 3, n_row * 2.5))
  for idx, cls in enumerate(all_interp):
    ax = fig.add_subplot(n_row, n_col, idx + 1)
    ax.plot(x, np.asarray(cls()(x)))
    ax.set_title(cls.__name__, fontsize=9)
  fig.tight_layout()
  V._FIGURES.append(fig)

  steps = np.arange(0, cfg["n_points"]).astype("float32")
  fig = plt.figure(figsize=(n_col * 3, n_row * 2.5))
  for idx, cls in enumerate(all_interp):
    ax = fig.add_subplot(n_row, n_col, idx + 1)
    curve = cls(cyclical=True, steps=50, delay_in=20, delay_out=10,
                vmin=1.0, vmax=2.0)
    ax.plot(steps, np.asarray(curve(steps)))
    ax.set_title(f"{cls.__name__} (cyclical)", fontsize=9)
  fig.tight_layout()
  V._FIGURES.append(fig)

  path = V.plot_save("/tmp/interpolation_figures.pdf")
  print("figure:", path or "/tmp/interpolation_figures.pdf")


if __name__ == "__main__":
  main()
