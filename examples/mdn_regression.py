"""Mixture density network on the classic inverse-sine problem
(reference: ``examples/mixture_density_net.py``): predicting x from
y = x + 0.3 sin(2 pi x) + noise is multimodal, so a Gaussian regression
head underfits while an MDN captures all branches.

The head is `MixtureDensityNetwork` (``bay/layers/dense_distribution.py``)
— a Dense projection into GMM-diag parameters returning a distribution
pytree, trained by maximum likelihood with one fused jitted step.
"""
import numpy as np

CONFIG = dict(n_components=8, hidden=64, n_train=4096, steps=3000, lr=1e-3)


def make_data(n, rng):
  x = rng.uniform(0.0, 1.0, size=(n, 1)).astype("float32")
  y = (x + 0.3 * np.sin(2 * np.pi * x) +
       rng.normal(scale=0.05, size=x.shape)).astype("float32")
  return y, x  # swapped: predict x from y (multimodal inverse)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import jax
  import jax.numpy as jnp
  import optax
  import flax.linen as nn

  from odin_tpu.bay.layers import MixtureDensityNetwork

  class MDN(nn.Module):
    n_components: int
    hidden: int

    @nn.compact
    def __call__(self, y, training=False):
      h = nn.relu(nn.Dense(self.hidden)(y))
      h = nn.relu(nn.Dense(self.hidden)(h))
      return MixtureDensityNetwork.create(
          1, n_components=self.n_components, name="head")(h, training)

  rng = np.random.RandomState(1)
  Y, X = make_data(cfg["n_train"], rng)
  model = MDN(n_components=cfg["n_components"], hidden=cfg["hidden"])
  params = model.init(jax.random.PRNGKey(0), Y[:2])
  opt = optax.adam(cfg["lr"])
  opt_state = opt.init(params)

  @jax.jit
  def step(params, opt_state, y, x):
    def loss_fn(p):
      qx = model.apply(p, y)
      return -jnp.mean(qx.log_prob(x))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  for i in range(cfg["steps"]):
    idx = rng.randint(0, len(Y), 256)
    params, opt_state, loss = step(params, opt_state, Y[idx], X[idx])
    if i % 500 == 0:
      print(f"step {i}: nll {float(loss):.4f}", flush=True)

  # sample the conditional p(x|y) on a grid — all branches must appear
  grid = np.linspace(Y.min(), Y.max(), 200).astype("float32")[:, None]
  qx = model.apply(params, grid)
  samples = np.asarray(qx.sample(jax.random.PRNGKey(1), (20,)))
  from odin_tpu import visual as vs
  ax = vs.plot_scatter(Y.ravel(), X.ravel(), title="MDN inverse-sine")
  for s in samples:
    ax.scatter(grid.ravel(), s.ravel(), s=2, alpha=0.25, color="crimson")
  out = vs.plot_save("/tmp/mdn_regression.pdf")
  print("figure:", out, "final nll:", float(loss))
  return float(loss)


if __name__ == "__main__":
  main()
