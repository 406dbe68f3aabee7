"""Native C++ beam search + ARPA LM: build, decode correctness vs greedy and
vs a known-best path, LM rescoring behavior, editdistance kernel."""

import math

import numpy as np
import pytest

from lightning_asr_tpu.decoding import greedy_decode_to_strings

nat = pytest.importorskip("lightning_asr_tpu.native")
if not nat.native_available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)

from lightning_asr_tpu.decoding.beam_search import BeamSearchDecoderWithLM  # noqa: E402

VOCAB = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]


def logits_for(text, vocab, T_per_char=2, peak=8.0):
    """Build (T, C) logits whose greedy path spells `text` (blank-separated)."""
    C = len(vocab) + 1
    blank = C - 1
    rows = []
    for ch in text:
        c = vocab.index(ch)
        for _ in range(T_per_char):
            row = np.zeros(C, np.float32)
            row[c] = peak
            rows.append(row)
        row = np.zeros(C, np.float32)
        row[blank] = peak
        rows.append(row)
    logits = np.stack(rows)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return np.log(e / e.sum(-1, keepdims=True))


def test_beam_matches_greedy_on_peaked_probs():
    texts = ["hello world", "a cat"]
    lps = [logits_for(t, VOCAB) for t in texts]
    T = max(lp.shape[0] for lp in lps)
    batch = np.full((len(lps), T, len(VOCAB) + 1), math.log(1.0 / (len(VOCAB) + 1)), np.float32)
    lengths = np.zeros(len(lps), np.int32)
    for i, lp in enumerate(lps):
        batch[i, : lp.shape[0]] = lp
        lengths[i] = lp.shape[0]

    dec = BeamSearchDecoderWithLM(VOCAB, beam_width=20)
    out = dec.forward(batch, lengths)
    assert out == texts

    preds = batch.argmax(-1)
    greedy = greedy_decode_to_strings(preds, lengths, VOCAB)
    assert greedy == texts


def test_beam_beats_greedy_on_ambiguous_path():
    """Classic CTC case: two paths for the same label collapse ('aa'->'a')
    can outweigh the single best path — prefix search must sum paths."""
    C = 4  # labels a, b, c + blank
    vocab = ["a", "b", "c"]
    # t=0: a .55, b .45 ; t=1: blank .6, b .4
    lp = np.log(np.array([
        [0.35, 0.45, 0.05, 0.15],
        [0.30, 0.35, 0.05, 0.30],
    ], np.float32))[None]
    dec = BeamSearchDecoderWithLM(vocab, beam_width=10)
    out = dec.forward(lp, np.array([2], np.int32))
    # 'b': .45*.35 + .45*.30(b,blank) + .35*.35(a?no) ... the summed-path 'b'
    # mass (bb + b_ + _b) exceeds any competing single collapse
    assert out == ["b"]


@pytest.fixture(scope="module")
def tiny_arpa(tmp_path_factory):
    """A small well-formed 2-gram ARPA file."""
    path = tmp_path_factory.mktemp("lm") / "tiny.arpa"
    path.write_text(
        "\n\\data\\\n"
        "ngram 1=6\n"
        "ngram 2=4\n"
        "\n\\1-grams:\n"
        "-1.2\t<unk>\n"
        "-0.5\t<s>\t-0.4\n"
        "-0.6\t</s>\n"
        "-0.7\tthe\t-0.3\n"
        "-0.9\tcat\t-0.2\n"
        "-1.1\tdog\t-0.2\n"
        "\n\\2-grams:\n"
        "-0.3\t<s> the\n"
        "-0.2\tthe cat\n"
        "-0.8\tthe dog\n"
        "-0.4\tcat </s>\n"
        "\n\\end\\\n"
    )
    return str(path)


def test_arpa_loader_scores(tiny_arpa):
    from lightning_asr_tpu.native import get_lib

    lib = get_lib()
    lm = lib.lasr_lm_load(tiny_arpa.encode())
    assert lm
    assert lib.lasr_lm_order(lm) == 2
    ln10 = math.log(10)
    # P(cat | the) is an explicit bigram: -0.2 log10
    s_cat = lib.lasr_lm_score_sentence(lm, b"the cat")
    # "the" after <s>: bigram -0.3 ; "cat" after "the": -0.2  => -0.5 log10
    np.testing.assert_allclose(s_cat, -0.5 * ln10, rtol=1e-5)
    # backoff path: P(dog | cat) = backoff(cat) + P(dog) = -0.2 + -1.1
    s = lib.lasr_lm_score_sentence(lm, b"cat dog")
    # 'cat' after <s>: no bigram -> backoff(<s>) -0.4 + P(cat) -0.9 = -1.3
    np.testing.assert_allclose(s, (-1.3 + -1.3) * ln10, rtol=1e-5)
    lib.lasr_lm_free(lm)


def test_lm_rescores_ambiguous_decode(tiny_arpa):
    """With an LM strongly preferring 'the cat', an acoustically ambiguous
    cat/cac decode should resolve to 'cat'."""
    vocab = [" ", "a", "c", "e", "h", "t", "g", "o", "d"]
    C = len(vocab) + 1
    blank = C - 1

    def row(probs: dict, base=0.001):
        r = np.full(C, base, np.float64)
        for ch, p in probs.items():
            idx = blank if ch == "_" else vocab.index(ch)
            r[idx] = p
        return np.log(r / r.sum())

    rows = [
        row({"t": 0.9}), row({"_": 0.9}),
        row({"h": 0.9}), row({"_": 0.9}),
        row({"e": 0.9}), row({"_": 0.9}),
        row({" ": 0.9}), row({"_": 0.9}),
        row({"c": 0.9}), row({"_": 0.9}),
        row({"a": 0.9}), row({"_": 0.9}),
        # ambiguous final char: 't' 0.46 vs 'c' 0.54 — acoustics prefer 'c'
        row({"t": 0.46, "c": 0.54}),
    ]
    lp = np.stack(rows)[None].astype(np.float32)
    lengths = np.array([len(rows)], np.int32)

    no_lm = BeamSearchDecoderWithLM(vocab, beam_width=30)
    assert no_lm.forward(lp, lengths) == ["the cac"]

    with_lm = BeamSearchDecoderWithLM(vocab, beam_width=30, alpha=2.0, beta=0.0,
                                      lm_path=tiny_arpa)
    assert with_lm.forward(lp, lengths) == ["the cat"]


def test_native_editdistance():
    from lightning_asr_tpu.native import editdistance_eval

    assert editdistance_eval(list("kitten"), list("sitting")) == 3
    assert editdistance_eval([], list("ab")) == 2
    assert editdistance_eval(["a", "b"], ["a", "b"]) == 0
    assert editdistance_eval("x y z".split(), "x z".split()) == 1
