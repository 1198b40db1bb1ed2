"""Encoder information bound under beta (reference:
``examples/vae/betavae_encoder_info_bound.py``): does a large-beta encoder
still retain enough information for good reconstruction?

Protocol (per beta): (1) train a dense BetaGammaVAE end-to-end for
``max_iter/2`` steps; (2) reset decoder+observation to their INITIAL
weights, freeze encoder+latents, and finetune the decoder alone for the
remaining steps (the reference's ``encoder.trainable = False`` two-phase
schedule, reference :125-134 — here expressed as
``fit(train_params=('vae/decoder', 'vae/observation'))`` nested-partition
training).  The finetuned test log-likelihood upper-bounds the information
the frozen encoder kept.

Run a sweep::

  python examples/vae/encoder_info_bound.py beta=0.5,1,2,5,10 -j 1
"""
import numpy as np

from odin_tpu.bay import RVconf
from odin_tpu.bay.vi import BetaGammaVAE
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import Dense, SequentialNetwork
from odin_tpu.training import ScoreBoard, run_hydra
from odin_tpu.training.core import get_param_subtree, set_param_subtree

CONFIG = dict(ds="dspritessmall", zdim=32, beta=1.0, gamma=1.0,
              max_iter=4000, batch_size=64, lr=5e-4, finetune_lr=1e-4,
              finetune=True)


def dense_networks(input_shape, zdim: int, units: int = 512):
  """Reference uses 3x1024 dense encoder/decoder on MNIST (:60-82); sized
  down for the procedural dSprites stand-in."""
  n_out = int(np.prod(input_shape))
  encoder = SequentialNetwork(
      tuple(Dense(units, "relu") for _ in range(3)), name="encoder")
  decoder = SequentialNetwork(
      tuple(Dense(units, "relu") for _ in range(3)), name="decoder")
  return dict(
      encoder=encoder,
      decoder=decoder,
      latents=RVconf((zdim,), "mvndiag", projection=True, name="latents"),
      observation=RVconf(tuple(input_shape), "bernoulli", projection=True,
                         name="image"),
      input_shape=tuple(input_shape),
      hierarchy=(),
  )


@run_hydra(output_dir="./results/encoder_info_bound", config=CONFIG)
def main(cfg):
  import jax

  ds = get_dataset(cfg.ds)
  x_test, _ = ds.numpy("test")
  x_test = ds.normalize255(x_test)[:2048]
  nets = dense_networks(x_test.shape[1:], cfg.zdim)
  vae = BetaGammaVAE(beta=cfg.beta, gamma=cfg.gamma, **nets).build(seed=1)
  # snapshot the INITIAL decoder-side weights for the reset
  init_dec = jax.device_get(get_param_subtree(vae.state.params, "vae/decoder"))
  init_obs = jax.device_get(
      get_param_subtree(vae.state.params, "vae/observation"))

  def test_llk():
    llk, _, _ = vae.elbo_components(vae.state.params, x_test[:512],
                                    jax.random.PRNGKey(0), 0, False, {})
    return float(np.mean(sum(np.asarray(v) for v in llk.values())))

  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  half = int(cfg.max_iter) // 2
  vae.fit(train, max_iter=half, learning_rate=cfg.lr, verbose=False,
          logdir=cfg.output_dir)
  llk_full = test_llk()

  llk_tuned = None
  if cfg.finetune:
    params = set_param_subtree(vae.state.params, "vae/decoder", init_dec)
    params = set_param_subtree(params, "vae/observation", init_obs)
    vae.state = vae.state.replace(params=params)
    vae.fit(train, max_iter=half, learning_rate=cfg.finetune_lr,
            train_params=("vae/decoder", "vae/observation"), verbose=False,
            logdir=cfg.output_dir)
    llk_tuned = test_llk()

  row = dict(beta=float(cfg.beta), gamma=float(cfg.gamma),
             zdim=int(cfg.zdim), llk_full=llk_full,
             llk_finetuned=llk_tuned if llk_tuned is not None else llk_full)
  ScoreBoard("./results/scoreboard.db").write(
      "encoder_info_bound", unique=["beta", "gamma", "zdim"], **row)
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in row.items()})
  return row


if __name__ == "__main__":
  main()
