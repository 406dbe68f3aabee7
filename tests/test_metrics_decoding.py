"""WER/CER + greedy decode vs reference semantics (and torch-free
editdistance correctness)."""

import numpy as np

import jax.numpy as jnp

from lightning_asr_tpu.decoding import greedy_decode_to_strings
from lightning_asr_tpu.metrics import WER, editdistance_eval, word_error_rate


def reference_greedy(prediction, length, blank_id, labels):
    """The reference's per-sample collapse loop (asr_metrics.py:161-170)."""
    decoded = []
    previous = blank_id
    for p in prediction[:length]:
        if (p != previous or previous == blank_id) and p != blank_id:
            decoded.append(p)
        previous = p
    return "".join(labels[c] for c in decoded)


def test_greedy_collapse_matches_reference_loop():
    rng = np.random.default_rng(0)
    labels = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]
    blank = len(labels)
    B, T = 8, 50
    preds = rng.integers(0, blank + 1, size=(B, T))
    lengths = rng.integers(1, T + 1, size=B)

    golden = [reference_greedy(preds[b], lengths[b], blank, labels) for b in range(B)]
    ours = greedy_decode_to_strings(preds, lengths, labels)
    assert ours == golden


def test_editdistance():
    assert editdistance_eval(list("kitten"), list("sitting")) == 3
    assert editdistance_eval([], list("abc")) == 3
    assert editdistance_eval(list("abc"), list("abc")) == 0
    assert editdistance_eval("a b c".split(), "a x c y".split()) == 2


def test_word_error_rate():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a x c"], ["a b c"]) == 1 / 3
    assert word_error_rate(["ab"], ["ac"], use_cer=True) == 0.5
    assert word_error_rate([""], [""]) == float("inf")


def test_wer_metric_accumulates():
    labels = ["a", "b", "c", " "]
    m = WER(labels)
    r1 = m.update(["a b"], ["a b"])
    assert r1 == 0.0
    r2 = m.update(["a x"], ["a b"])  # 1 error / 2 words
    assert r2 == 0.5
    assert m.compute() == 1 / 4  # 1 error over 4 ref words total
    m.merge_counts(3, 4)  # distributed partner counts
    assert m.compute() == 4 / 8
    m.reset()
    assert m.words == 0


def test_wer_decode_reference():
    labels = [" ", "a", "b"]
    m = WER(labels)
    targets = np.array([[1, 0, 2, 0], [2, 2, 0, 0]])
    lens = np.array([3, 2])
    assert m.decode_reference(targets, lens) == ["a b", "bb"]
