"""KL-divergence intuition (reference: ``examples/understand_kl_divergence.py``):

1. Monte-Carlo KL converges to the analytic value as samples grow — the
   `kl_divergence` registry (``bay/helpers.py``) dispatches analytic pairs
   and falls back to MC otherwise.
2. Fitting a unimodal Gaussian q to a bimodal target p shows the classic
   asymmetry: reverse KL(q||p) is mode-seeking (locks one mode), forward
   KL(p||q) is mass-covering (broad q spanning both).
"""
import numpy as np

CONFIG = dict(steps=1500, lr=5e-2)


def main(cfg=None):
  cfg = {**CONFIG, **(cfg or {})}
  import jax
  import jax.numpy as jnp
  import optax

  from odin_tpu.bay import kl_divergence
  from odin_tpu.bay import distributions as D

  # 1. MC estimate -> analytic value
  q = D.Normal(jnp.float32(0.5), jnp.float32(1.2))
  p = D.Normal(jnp.float32(0.0), jnp.float32(1.0))
  exact = float(kl_divergence(q, p, analytic=True))
  print(f"analytic KL {exact:.5f}")
  for n in (10, 100, 1000, 10000):
    mc = float(jnp.mean(kl_divergence(q, p, analytic=False, q_sample=n,
                                      seed=jax.random.PRNGKey(1))))
    print(f"  MC n={n:<6d} {mc:.5f}  (err {abs(mc - exact):.5f})")

  # 2. forward (mass-covering) vs reverse (mode-seeking) KL
  p_mix = D.MixtureSameFamily(
      D.Categorical(logits=jnp.zeros(2)),
      D.Normal(jnp.asarray([-2.0, 2.0], jnp.float32),
               jnp.asarray([0.5, 0.5], jnp.float32)))

  def fit(direction: str):
    theta = {"loc": jnp.float32(0.1), "log_scale": jnp.float32(0.0)}
    opt = optax.adam(cfg["lr"])
    opt_state = opt.init(theta)

    @jax.jit
    def step(theta, opt_state, rng):
      def loss_fn(t):
        qz = D.Normal(t["loc"], jnp.exp(t["log_scale"]))
        if direction == "reverse":  # E_q[log q - log p]
          z = qz.sample(rng, (512,))
          return jnp.mean(qz.log_prob(z) - p_mix.log_prob(z))
        z = p_mix.sample(rng, (512,))  # forward: E_p[log p - log q]
        return jnp.mean(p_mix.log_prob(z) - qz.log_prob(z))

      loss, grads = jax.value_and_grad(loss_fn)(theta)
      updates, opt_state = opt.update(grads, opt_state, theta)
      return optax.apply_updates(theta, updates), opt_state, loss

    rng = jax.random.PRNGKey(0)
    for _ in range(cfg["steps"]):
      rng, k = jax.random.split(rng)
      theta, opt_state, loss = step(theta, opt_state, k)
    return (float(theta["loc"]), float(jnp.exp(theta["log_scale"])),
            float(loss))

  loc_r, scale_r, _ = fit("reverse")
  loc_f, scale_f, _ = fit("forward")
  print(f"reverse KL: q = N({loc_r:+.2f}, {scale_r:.2f})  <- mode-seeking "
        f"(sits on one mode, small scale)")
  print(f"forward  KL: q = N({loc_f:+.2f}, {scale_f:.2f})  <- mass-covering "
        f"(centered, wide)")
  assert scale_f > scale_r, "forward-KL fit must be broader"
  return dict(reverse=(loc_r, scale_r), forward=(loc_f, scale_f))


if __name__ == "__main__":
  main()
