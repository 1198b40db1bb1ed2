"""Kaldi archive interop without pykaldi (reference: the pykaldi-based
``odin/preprocessing/kaldi_io.py`` workflow).

Self-contained demo: extract MFCCs with the native pipeline, write them as a
Kaldi binary archive (compressed, Kaldi-readable), then stream x-vector
style minibatches back through `KaldiDataset`.

Run: ``python examples/kaldi_interop.py``
"""
import os
import tempfile

import numpy as np

from odin_tpu.preprocessing import (MFCCsExtractor, MelsSpecExtractor,
                                    PowerSpecExtractor, SADthreshold,
                                    STFTExtractor, make_pipeline)
from odin_tpu.preprocessing.kaldi import (KaldiDataset, KaldiFeaturesReader,
                                          count_frames, write_ark)


def main():
  sr = 16000
  rng = np.random.RandomState(0)
  pipe = make_pipeline([
      STFTExtractor(frame_length=0.025, step_length=0.010),
      PowerSpecExtractor(),
      MelsSpecExtractor(n_mels=24),
      MFCCsExtractor(n_ceps=13),
      SADthreshold(),
  ])

  # 1) extract features for a handful of synthetic utterances
  feats, sads, labels = {}, {}, []
  for i in range(12):
    f0 = 120 + 40 * (i % 3)
    dur = rng.uniform(1.0, 2.0)
    t = np.arange(int(dur * sr)) / sr
    y = np.sin(2 * np.pi * f0 * t).astype("f") + \
        0.01 * rng.randn(len(t)).astype("f")
    out = pipe.transform({"raw": y, "sr": sr})
    feats[f"utt{i:02d}"] = np.asarray(out["mfcc"], "f")
    sads[f"utt{i:02d}"] = np.asarray(out["sad"], "f")
    labels.append(i % 3)

  # 2) write Kaldi archives (+scp); compressed matrices match Kaldi's "CM "
  d = tempfile.mkdtemp()
  fspecs = write_ark(os.path.join(d, "mfcc.ark"), feats,
                     scp_path=os.path.join(d, "mfcc.scp"), compress=True)
  sspecs = write_ark(os.path.join(d, "sad.ark"), sads)
  print(f"wrote {len(fspecs)} utterances; "
        f"frame counts: {count_frames(list(fspecs.values()), is_matrix=True)}")

  # 3) stream sliding-CMN-normalized, SAD-masked, length-clipped batches
  mfcc = KaldiFeaturesReader("mfcc", cmn_window=300, cmn_min_window=50)
  sad = KaldiFeaturesReader("sad", is_matrix=False)
  ds = KaldiDataset({mfcc: list(fspecs.values()),
                     sad: list(sspecs.values())},
                    sad_name="sad", labels=labels, batch_size=4,
                    post_processing="xvector", clipping=(50, 80),
                    batch_strategy="stratify", seed=1)
  for i, ((x,), y) in enumerate(ds):
    print(f"batch {i}: x{tuple(x.shape)} labels={y.tolist()}")


if __name__ == "__main__":
  main()
