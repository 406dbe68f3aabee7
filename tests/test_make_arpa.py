"""ARPA LM trainer (scripts/make_arpa_lm.py): exact normalization, held-out
perplexity beats unigram, and the native C++ scorer reproduces the python
scoring (same backoff recursion, ctc_beam_search.cpp:139-156) on the
written file."""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from make_arpa_lm import (  # noqa: E402
    BOS,
    EOS,
    UNK,
    perplexity,
    score_word,
    train_arpa,
    write_arpa,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    voc = [f"w{i}" for i in range(40)]
    trans = rng.dirichlet(np.ones(40) * 0.1, size=40)

    def sent():
        w = [int(rng.integers(40))]
        for _ in range(int(rng.integers(3, 9))):
            w.append(int(rng.choice(40, p=trans[w[-1]])))
        return [voc[i] for i in w]

    return [sent() for _ in range(1500)], [sent() for _ in range(200)], voc


@pytest.fixture(scope="module")
def tables(corpus):
    train, _, _ = corpus
    return train_arpa(train, 3)[0]


def test_distributions_normalize(tables, corpus):
    _, _, voc = corpus
    for hist in ([], [voc[3]], [voc[1], voc[2]], [BOS], ["oov-word"]):
        s = sum(10 ** score_word(tables, hist, w, 3)
                for w in voc + [EOS, UNK])
        assert abs(s - 1.0) < 1e-6, (hist, s)


def test_trigram_beats_unigram_on_heldout(tables, corpus):
    _, held, _ = corpus
    ppl3 = perplexity(tables, held, 3)
    ppl1 = perplexity({1: tables[1]}, held, 1)
    assert ppl3 < 0.6 * ppl1  # the Markov structure must be captured


def test_cpp_scorer_matches_python(tables, corpus, tmp_path):
    nat = pytest.importorskip("lightning_asr_tpu.native")
    if not nat.native_available():
        pytest.skip("native lib unavailable")
    _, held, _ = corpus
    path = tmp_path / "lm.arpa"
    write_arpa(tables, path)
    lib = nat.get_lib()
    lm = lib.lasr_lm_load(str(path).encode())
    assert lm
    try:
        for words in held[:5]:
            cpp = lib.lasr_lm_score_sentence(lm, " ".join(words).encode())
            py, hist = 0.0, [BOS]
            for w in words:
                ww = w if (w,) in tables[1] else UNK
                py += score_word(tables, hist, ww, 3)
                hist.append(ww)
            assert abs(cpp - py * math.log(10)) < 1e-3
    finally:
        lib.lasr_lm_free(lm)
