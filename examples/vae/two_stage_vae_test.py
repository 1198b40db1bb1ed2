"""Two-stage VAE (reference: ``examples/vae/two_stage_vae_test.py``):
stage 1 learns the manifold, stage 2 fixes the prior-hole mismatch by
training a second VAE on stage-1 latents; sampling goes stage2-prior ->
stage2-decode -> stage1-decode.

Run::

  python examples/vae/two_stage_vae_test.py max_iter=5000
"""
from odin_tpu.bay.vi import DisentanglementGym, TwoStageVAE
from odin_tpu.fuel import get_dataset
from odin_tpu.networks import get_networks
from odin_tpu.training import run_hydra

CONFIG = dict(ds="dspritessmall", zdim=10, batch_size=32, max_iter=5000,
              lr=1e-3, eval_samples=1000)


@run_hydra(output_dir="./results/two_stage", config=CONFIG)
def main(cfg):
  ds = get_dataset(cfg.ds)
  nets = get_networks("dsprites", zdim=cfg.zdim)
  vae = TwoStageVAE(**nets).build()
  train = ds.create_dataset("train", batch_size=cfg.batch_size, epochs=-1)
  valid = ds.create_dataset("valid", batch_size=cfg.batch_size, epochs=1)
  vae.fit(train, valid=valid, max_iter=cfg.max_iter, learning_rate=cfg.lr,
          valid_freq=max(cfg.max_iter // 5, 1), logdir=cfg.output_dir)
  gym = DisentanglementGym(dataset=ds, model=vae)
  gym.run_model(n_samples=cfg.eval_samples, partition="test")
  report = gym.write_report(path=f"{cfg.output_dir}/report.txt")
  print({k: round(v, 4) if isinstance(v, float) else v
         for k, v in report.items()})
  return report


if __name__ == "__main__":
  main()
