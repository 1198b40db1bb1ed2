"""Text tokenization, TextGrid parsing, audio feature loader, ML extras."""
import numpy as np
import pytest

from odin_tpu.preprocessing.text import Tokenizer, ngrams, simple_tokenizer
from odin_tpu.preprocessing.textgrid import read_textgrid
from odin_tpu.fuel.audio_data import AudioFeatureLoader
from odin_tpu.ml import GMMThreshold, GMMclassifier, ProbabilisticEmbedding

RNG = np.random.RandomState(13)


def test_tokenizer():
  tok = Tokenizer(n_words=50).fit(["the cat sat", "the dog sat on the mat"])
  assert simple_tokenizer("Hello, World!") == ["hello", "world"]
  assert ngrams(["a", "b", "c"]) == ["a_b", "b_c"]
  ids = tok.encode("the cat jumped")
  assert ids[-1] == 1  # unk
  assert tok.decode(ids) == "the cat <unk>"
  seq = tok.transform(["the cat"], maxlen=4, mode="seq")
  assert seq.shape == (1, 4) and seq[0, -1] == 0  # padded
  bow = tok.transform(["the the cat"], mode="count")
  assert bow[0, tok.word_index["the"]] == 2
  tfidf = tok.transform(["the cat", "dog"], mode="tfidf")
  assert tfidf.shape == (2, tok.vocab_size)


def test_textgrid():
  tg_text = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2.5
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals [1]:
            xmin = 0
            xmax = 1.2
            text = "hello"
        intervals [2]:
            xmin = 1.2
            xmax = 2.5
            text = "world"
'''
  tg = read_textgrid(tg_text)
  assert tg.tier_names == ["words"]
  assert tg["words"].labels() == [(0.0, 1.2, "hello"), (1.2, 2.5, "world")]
  assert tg["words"].intervals[0].duration == pytest.approx(1.2)


def test_audio_feature_loader():
  utts = [(RNG.randn(16000).astype("f"), 16000) for _ in range(10)]
  loader = AudioFeatureLoader(utts, feature="mspec", max_duration=1.0,
                              labels=np.arange(10) % 2)
  x, y = loader.numpy("train")
  assert x.shape[1:] == loader.shape
  xb, yb = next(iter(loader.create_dataset("train", batch_size=4,
                                           inc_labels=True, epochs=1)))
  assert xb.shape == (4,) + loader.shape
  # compat='tf' + mfcc must honor n_ceps (regression: it was hardcoded to
  # None, silently returning num_mel_bins coefficients)
  tf_loader = AudioFeatureLoader(utts[:2], feature="mfcc", n_mels=24,
                                 n_ceps=13, max_duration=1.0, compat="tf")
  assert tf_loader.config.num_cepstral == 13
  assert tf_loader.shape[1] == 13
  x2 = tf_loader.numpy("train")
  assert x2.shape[1:] == tf_loader.shape


def test_gmm_embedding_helpers():
  scores = np.concatenate([RNG.randn(100, 2) * 0.3,
                           RNG.randn(100, 2) * 0.3 + 3])
  pe = ProbabilisticEmbedding().fit(scores)
  b = pe.binarize(scores)
  assert b[:100].mean() < 0.1 and b[100:].mean() > 0.9
  X = np.concatenate([RNG.randn(50, 4), RNG.randn(50, 4) + 4])
  y = np.r_[np.zeros(50), np.ones(50)].astype(int)
  clf = GMMclassifier(n_components=2).fit(X, y)
  assert (clf.predict(X) == y).mean() > 0.98
  assert clf.predict_proba(X).shape == (100, 2)
  th = GMMThreshold().fit(np.r_[RNG.randn(200), RNG.randn(200) + 5])
  assert 1.0 < th.threshold_ < 4.0
