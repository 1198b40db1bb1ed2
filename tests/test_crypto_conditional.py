"""AES crypto utilities, ConditionalTensor, video IO."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_encrypt_decrypt_roundtrip(tmp_path):
  from odin_tpu.utils.crypto import decrypt_aes, encrypt_aes
  data = b"secret payload" * 100
  blob = encrypt_aes(data, "hunter2")
  assert blob[:5] == b"OTPU1" and blob != data
  assert decrypt_aes(blob, "hunter2") == data
  with pytest.raises(ValueError, match="wrong password|corrupted"):
    decrypt_aes(blob, "wrong")
  # tampering is detected (GCM tag)
  bad = blob[:-1] + bytes([blob[-1] ^ 1])
  with pytest.raises(ValueError):
    decrypt_aes(bad, "hunter2")
  # file path in / out
  p = tmp_path / "x.bin"; p.write_bytes(data)
  out = tmp_path / "x.enc"
  encrypt_aes(str(p), "pw", outfile=str(out))
  assert decrypt_aes(str(out), "pw") == data


def test_zip_aes_folder_roundtrip(tmp_path):
  from odin_tpu.utils.crypto import md5_folder, unzip_aes, zip_aes
  src = tmp_path / "src"; src.mkdir()
  (src / "a.txt").write_text("alpha")
  sub = src / "sub"; sub.mkdir()
  (sub / "b.npy").write_bytes(np.arange(10).tobytes())
  arc = tmp_path / "src.zip.aes"
  zip_aes(str(src), str(arc), password="pw")
  dst = tmp_path / "dst"
  unzip_aes(str(arc), str(dst), password="pw")
  assert (dst / "src" / "a.txt").read_text() == "alpha"
  assert md5_folder(str(src)) == md5_folder(str(dst / "src"))
  with pytest.raises(ValueError, match="password is required"):
    unzip_aes(str(arc), str(tmp_path / "nope"))


def test_conditional_tensor():
  from odin_tpu.bay.distributions import (ConditionalTensor, Independent,
                                          Normal, exact_kl)
  base = Independent(Normal(jnp.zeros((4, 3)), jnp.ones((4, 3))), 1)
  y = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 5)
  ct = ConditionalTensor(base, y)
  assert ct.event_shape == (8,)
  s = ct.sample(jax.random.PRNGKey(0))
  assert s.shape == (4, 8)
  np.testing.assert_array_equal(np.asarray(s[:, 3:]), np.asarray(y))
  # log_prob of own samples == base log_prob of the latent slice
  np.testing.assert_allclose(np.asarray(ct.log_prob(s)),
                             np.asarray(base.log_prob(s[:, :3])), rtol=1e-6)
  np.testing.assert_array_equal(np.asarray(ct.mean()[:, 3:]), np.asarray(y))
  # KL ignores the conditioning tensor
  p = ConditionalTensor(
      Independent(Normal(jnp.ones((4, 3)), jnp.ones((4, 3))), 1),
      jnp.zeros((4, 5)))
  np.testing.assert_allclose(
      np.asarray(exact_kl(ct, p)),
      np.asarray(exact_kl(base, p.distribution)), rtol=1e-6)
  # pytree: survives jit
  @jax.jit
  def f(d):
    return d.mean().sum()
  assert np.isfinite(float(f(ct)))


def test_video_roundtrip(tmp_path):
  pytest.importorskip("imageio")
  from odin_tpu.preprocessing import video
  rng = np.random.RandomState(0)
  frames = (rng.rand(8, 32, 48, 3) * 255).astype(np.uint8)
  p = tmp_path / "clip.gif"  # gif: no ffmpeg binary needed
  video.save(str(p), frames, fps=10)
  out, fps = video.read(str(p))
  assert out.shape[0] == 8 and out.shape[-1] in (3, 4)
  assert out.shape[1:3] == (32, 48)
  crop, _ = video.read(str(p), boxes=(4, 20, 8, 40))
  assert crop.shape[1:3] == (16, 32)
