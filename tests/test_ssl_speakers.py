"""Speaker-accent corpus machinery for the low-label SSL A/B
(scripts/ssl_smoke.py): per-(speaker, char) pattern perturbations give the
supervised baseline a real generalization gap at convergence, so
pseudo-labeling's unlabeled-speaker coverage has something structural to
add (the regime ``/root/reference/train_ssl.py:223-260`` exists for)."""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from ssl_smoke import LABELS, FRAMES_PER_CHAR, make_corpus, speaker_deltas


def test_speaker_deltas_deterministic():
    a = speaker_deltas(12, 0.8)
    b = speaker_deltas(12, 0.8)
    assert a.shape == (12, len(LABELS), 512)
    np.testing.assert_array_equal(a, b)
    # the same speaker id must be the same accent regardless of table size
    # (corpora carve disjoint id ranges out of ONE global table)
    c = speaker_deltas(40, 0.8)
    np.testing.assert_array_equal(a, c[:12])


def test_corpus_speakers_in_range_and_consistent(tmp_path):
    deltas = speaker_deltas(20, 1.0)
    manifest = make_corpus(tmp_path, 24, seed=5, name="spk",
                           patterns=np.zeros((len(LABELS), 512), np.float32),
                           noise=(0.0, 0.0), speakers=(deltas, 4, 9))
    rows = [json.loads(l) for l in open(manifest)]
    assert len(rows) == 24
    spks = {r["speaker"] for r in rows}
    assert spks <= set(range(4, 9)) and len(spks) > 1
    # with zero base patterns and zero noise, every emitted frame IS the
    # speaker's accent delta for that char — check one utterance exactly
    r = rows[0]
    import pickle

    feats = pickle.load(
        open(tmp_path / "feats" / (Path(r["audio_filepath"]).stem + ".pkl"),
             "rb"))[0]
    for j, ch in enumerate(r["text"][:6]):
        frame = feats[j * FRAMES_PER_CHAR]
        np.testing.assert_allclose(
            frame, deltas[r["speaker"], LABELS.index(ch)], rtol=1e-6)


def test_corpus_without_speakers_unchanged(tmp_path):
    patterns = np.random.default_rng(0).standard_normal(
        (len(LABELS), 512)).astype(np.float32)
    manifest = make_corpus(tmp_path, 4, seed=5, name="plain",
                           patterns=patterns)
    rows = [json.loads(l) for l in open(manifest)]
    assert all("speaker" not in r for r in rows)
