"""Hot-word (contextual-biasing) boosting in the native beam decoder —
beyond-reference capability.  Semantics under test: partial trie matches
earn boost/len per char, retracted on mismatch / word boundary / end of
sequence; a completed hotword locks in exactly its boost."""

import numpy as np
import pytest

pytest.importorskip("ctypes")
from lightning_asr_tpu.decoding.beam_search import BeamSearchDecoderWithLM
from lightning_asr_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")

VOCAB = [" ", "a", "b", "c"]  # blank = 4


def _logits(rows):
    """rows: list of dicts {symbol_or_'_': logp}; '_' = blank. Missing
    symbols get a very low logp. Returns (1, T, 5) log-probs."""
    T = len(rows)
    out = np.full((1, T, 5), -12.0, np.float32)
    idx = {s: i for i, s in enumerate(VOCAB)}
    idx["_"] = 4
    for t, row in enumerate(rows):
        for s, lp in row.items():
            out[0, t, idx[s]] = lp
    return out


def _decode(hotwords=None, **kw):
    dec = BeamSearchDecoderWithLM(VOCAB, beam_width=8, alpha=1.0, beta=0.0,
                                  hotwords=hotwords, num_cpus=1, **kw)
    lp = _logits([
        {"a": -0.05, "_": -4.0},
        {"c": -0.6, "b": -0.9, "_": -3.0},
    ])
    return dec.forward(lp, np.array([2], np.int32))[0]


def test_hotword_flips_close_decision():
    assert _decode() == "ac"                      # baseline: 'c' wins
    assert _decode(hotwords={"ab": 3.0}) == "ab"  # completed hotword boost


def test_incomplete_hotword_is_retracted():
    # "abc" never completes within 2 frames: the partial boost on "ab" must
    # be fully retracted at end-of-sequence, so the baseline winner stays
    assert _decode(hotwords={"abc": 9.0}) == "ac"


def test_word_boundary_retracts_partial():
    dec = BeamSearchDecoderWithLM(VOCAB, beam_width=8, alpha=1.0, beta=0.0,
                                  hotwords={"abc": 9.0}, num_cpus=1)
    # mid-word the "ab…" beam rides a large partial-"abc" boost, but the
    # space at frame 2 retracts it, so the baseline winner "ac c" prevails
    lp = _logits([
        {"a": -0.05},
        {"c": -0.4, "b": -0.5},
        {" ": -0.05},
        {"c": -0.05},
    ])
    out = dec.forward(lp, np.array([4], np.int32))[0]
    assert out == "ac c"


def test_completed_hotword_exact_boost_accounting():
    # boost large enough to overcome a 2.0-logit deficit exactly when the
    # word completes (flip threshold between 1.9 and 2.1 boost)
    def run(boost):
        dec = BeamSearchDecoderWithLM(VOCAB, beam_width=8, alpha=1.0,
                                      beta=0.0, hotwords={"ab": boost},
                                      num_cpus=1)
        lp = _logits([
            {"a": -0.05},
            {"c": -0.1, "b": -2.1},  # 'b' trails by 2.0
        ])
        return dec.forward(lp, np.array([2], np.int32))[0]

    assert run(1.9) == "ac"
    assert run(2.1) == "ab"


def test_char_level_restart_without_space():
    # vocab with no space symbol (Mandarin-style): match may restart
    # mid-sequence after falling off the trie
    vocab = ["x", "y", "z"]
    dec = BeamSearchDecoderWithLM(vocab, beam_width=8, alpha=1.0, beta=0.0,
                                  hotwords={"yz": 3.0}, num_cpus=1)
    out = np.full((1, 3, 4), -12.0, np.float32)
    idx = {s: i for i, s in enumerate(vocab)}
    for t, (s, lp), in enumerate([("x", -0.05), ("y", -0.05), ("z", -1.5)]):
        out[0, t, idx[s]] = lp
    # competing symbol at t=2
    out[0, 2, idx["x"]] = -1.2
    assert dec.forward(out, np.array([3], np.int32))[0] == "xyz"


def test_multibyte_vocab_tokenization():
    vocab = [" ", "th", "e", "a"]
    dec = BeamSearchDecoderWithLM(vocab, beam_width=4, hotwords={"the": 1.0},
                                  num_cpus=1)
    assert dec._tokenize("the") == [1, 2]
    with pytest.raises(ValueError):
        dec._tokenize("thx")


def test_multiword_hotword_rejected():
    """A hotword containing a space can never complete in the word-level
    decoder (the space resets the trie), so registration must fail loudly
    instead of silently earning-and-retracting boosts (ADVICE r2)."""
    with pytest.raises(ValueError, match="space"):
        BeamSearchDecoderWithLM(VOCAB, beam_width=4, num_cpus=1,
                                hotwords={"a b": 2.0})
