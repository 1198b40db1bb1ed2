"""Corpus-scale sustained extraction run (VERDICT r3 task 6).

The 5.3M frames/s driver metric is a micro number (synthetic buffers already
in RAM).  This records the PRODUCTION path end-to-end over a >=1 GB on-disk
corpus: wav files -> raw int16 decode -> padded batches -> device ingest ->
fused mel/MFCC/CMVN/VAD kernel -> per-utterance MmapArray indices + corpus
sum1/sum2 stats on disk (`preprocessing.DeviceCorpusProcessor`).

Reference bar: ``odin/preprocessing/processor.py:557-740`` (the MPI
multiprocess FeatureProcessor).  A 1-core NumPy reference rate for the same
extractor chain is measured on a small slice for the speedup column.

Run:  python benchmarks/corpus_extraction_bench.py [--speakers 64 --utt 64]
"""
import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "results")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--speakers", type=int, default=64)
  ap.add_argument("--utt", type=int, default=64)
  ap.add_argument("--dur", type=float, default=8.0)
  ap.add_argument("--workdir", default="/tmp/odin_corpus_bench")
  ap.add_argument("--transfer-dtype", default="",
                  help="'float16' halves the d2h feature stream (the "
                       "measured 81.5%% device_wait bucket); on-disk "
                       "contract stays float32")
  ap.add_argument("--out-tag", default="",
                  help="suffix for the output json (paired A/B draws)")
  args = ap.parse_args()

  from odin_tpu.fuel.audio_data import synth_speaker_corpus
  from odin_tpu.ops.features import FeatureConfig
  from odin_tpu.preprocessing import DeviceCorpusProcessor
  from odin_tpu.preprocessing.speech import save_wave

  wav_dir = os.path.join(args.workdir, "wavs")
  feat_dir = os.path.join(args.workdir, "features")

  # --- 1. materialize the corpus on disk (skipped if already there)
  n_files = args.speakers * args.utt
  if not (os.path.isdir(wav_dir) and
          len(os.listdir(wav_dir)) == n_files):
    shutil.rmtree(wav_dir, ignore_errors=True)
    os.makedirs(wav_dir)
    t0 = time.time()
    utts, labels = synth_speaker_corpus(args.speakers, args.utt,
                                        dur=args.dur)
    for i, (y, s) in enumerate(zip(utts, labels)):
      save_wave(os.path.join(wav_dir, f"spk{s:03d}_utt{i:05d}.wav"), y,
                16000)
    del utts
    print(f"corpus written in {time.time() - t0:.0f}s", flush=True)
  files = sorted(os.path.join(wav_dir, f) for f in os.listdir(wav_dir))
  corpus_gb = sum(os.path.getsize(f) for f in files) / 1e9
  print(f"{len(files)} files, {corpus_gb:.2f} GB on disk", flush=True)

  # --- 2. the production run
  cfg = FeatureConfig(n_mels=24, n_ceps=14)
  shutil.rmtree(feat_dir, ignore_errors=True)
  t0 = time.time()
  ds = DeviceCorpusProcessor(files, feat_dir, config=cfg,
                             features=("mspec", "mfcc_cmvn", "vad"),
                             batch_size=64,
                             pad_seconds=args.dur,
                             transfer_dtype=args.transfer_dtype or None
                             ).run(verbose=True)
  wall = time.time() - t0
  fps = ds.attrs["frames_per_sec"]
  out_gb = sum(os.path.getsize(os.path.join(feat_dir, f))
               for f in os.listdir(feat_dir)) / 1e9
  print(f"TPU sustained: {ds.attrs['frames'] / 1e6:.1f}M frames in "
        f"{wall:.0f}s = {fps / 1e6:.2f}M frames/s "
        f"({corpus_gb:.2f} GB in -> {out_gb:.2f} GB features out)",
        flush=True)
  phase = ds.attrs.get("phase_sec", {})
  if phase:
    tot = max(sum(phase.values()), 1e-9)
    print("phase decomposition (host wall-clock inside run()):", flush=True)
    for k, v in sorted(phase.items(), key=lambda kv: -kv[1]):
      print(f"  {k:12s} {v:7.1f}s  {100 * v / tot:5.1f}%", flush=True)

  # --- 3. 1-core NumPy reference rate on a slice (same extractor chain)
  from odin_tpu.preprocessing import (AcousticNorm, AudioReader,
                                      MFCCsExtractor, MelsSpecExtractor,
                                      PowerSpecExtractor, SADgmm,
                                      STFTExtractor, make_pipeline)
  pipe = make_pipeline([
      AudioReader(sr=16000),
      STFTExtractor(frame_length=cfg.frame_length / cfg.sr,
                    step_length=cfg.step_length / cfg.sr),
      PowerSpecExtractor(),
      MelsSpecExtractor(n_mels=cfg.n_mels),
      MFCCsExtractor(n_ceps=cfg.n_ceps),
      SADgmm(),
      AcousticNorm(input_name=("mfcc",), sad_name=None),
  ])
  slice_files = files[:24]
  t0 = time.time()
  ref_frames = 0
  for f in slice_files:
    r = pipe.transform(f)
    ref_frames += len(r["mfcc"])
  ref_fps = ref_frames / (time.time() - t0)
  print(f"1-core NumPy reference: {ref_fps / 1e3:.1f}k frames/s "
        f"-> speedup {fps / ref_fps:.0f}x", flush=True)

  row = dict(corpus_gb=round(corpus_gb, 2), n_files=len(files),
             frames=int(ds.attrs["frames"]), wallclock_sec=round(wall, 1),
             frames_per_sec=round(fps),
             numpy_frames_per_sec=round(ref_fps),
             speedup=round(fps / ref_fps, 1),
             features_gb=round(out_gb, 2),
             phase_sec=phase,
             transfer_dtype=args.transfer_dtype or "float32",
             config="64 spk x 64 utt x 8 s, int16 raw ingest, batch 64")
  # keep the round-4 measurement for the history (same corpus, the
  # pre-decomposition write path)
  prev = os.path.join(OUT, "corpus_extraction.json")
  if os.path.exists(prev) and not os.path.exists(
      os.path.join(OUT, "corpus_extraction_r4.json")):
    os.rename(prev, os.path.join(OUT, "corpus_extraction_r4.json"))
  target = (os.path.join(OUT, f"corpus_extraction_{args.out_tag}.json")
            if args.out_tag else prev)
  with open(target, "w") as f:
    json.dump(row, f, indent=1)
  print(json.dumps(row), flush=True)


if __name__ == "__main__":
  main()
