"""SSL path: confidence scoring vs the reference's per-frame loop, offline
feature batching, pseudo-label injection plumbing."""

import json
import pickle

import numpy as np
import pytest

from lightning_asr_tpu.data.vocab import Vocabulary
from lightning_asr_tpu.ssl_codec.confidence import seq_sum_logprob, sum_logprob
from lightning_asr_tpu.ssl_codec.ssl_datamodule import SSLBucketBatcher, SSLDataModule


def reference_confidence_loop(log_probs, length, blank_check_value):
    """The reference's scalar loop (ssl_codec/utils.py:8-28)."""
    am = log_probs.argmax(axis=-1)
    mx = log_probs.max(axis=-1)
    total = -1e-5
    count = 0.0
    for j in range(length):
        if am[j] == blank_check_value:
            continue
        total += mx[j]
        count += 1
    return -(total / (count + 1e-6))


@pytest.mark.parametrize("use_blank_id", [None, 28])
def test_confidence_matches_reference_loop(use_blank_id):
    rng = np.random.default_rng(0)
    B, T, C = 4, 37, 29
    lp = np.log(rng.dirichlet(np.ones(C), size=(B, T)))
    lens = np.array([37, 20, 5, 1])

    # reference compares argmax against C (= num classes), which never fires;
    # blank_id=None reproduces that, blank_id=28 is the intended behavior
    check_value = C if use_blank_id is None else use_blank_id
    golden = [reference_confidence_loop(lp[b], lens[b], check_value) for b in range(B)]
    ours = sum_logprob(lp, lens, blank_id=use_blank_id)
    np.testing.assert_allclose(ours, golden, rtol=1e-6)

    idx, score = seq_sum_logprob((7, lp[0], int(lens[0])), blank_id=use_blank_id)
    assert idx == 7
    np.testing.assert_allclose(score, golden[0], rtol=1e-6)


def test_confidence_measure_zoo():
    """The measure zoo (beyond reference, used by the pseudo-label filter
    via SSLTrainer(pseudo_confidence_measure=...)): every measure is
    lower-is-more-confident and respects valid lengths."""
    from lightning_asr_tpu.ssl_codec.confidence import confidence_scores

    rng = np.random.default_rng(1)
    B, T, C = 3, 24, 9
    # row 0: peaked (confident) distributions; row 1: near-uniform; row 2:
    # peaked except one garbage frame inside the valid region
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    logits[0] += 8.0 * np.eye(C)[rng.integers(0, C - 1, T)]
    logits[2] += 8.0 * np.eye(C)[rng.integers(0, C - 1, T)]
    logits[2, 5] = 0.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lens = np.array([T, T, T])

    for m in ("ref", "nonblank", "min_maxlp", "entropy"):
        s = confidence_scores(lp, lens, blank_id=C - 1, measure=m)
        assert s.shape == (B,)
        assert s[0] < s[1], m  # peaked beats uniform on every measure
    # the weakest-frame measure flags the garbage frame the mean hides
    s_min = confidence_scores(lp, lens, blank_id=C - 1, measure="min_maxlp")
    s_ref = confidence_scores(lp, lens, blank_id=C - 1, measure="ref")
    assert (s_min[2] - s_min[0]) > (s_ref[2] - s_ref[0])
    # ref == sum_logprob with the never-firing blank check
    np.testing.assert_allclose(
        confidence_scores(lp, lens, blank_id=C - 1, measure="ref"),
        sum_logprob(lp, lens, None), rtol=1e-6)
    # length masking: padding frames must not affect scores
    lp2 = lp.copy()
    lp2[:, 12:] = -1e9 * 0 + rng.standard_normal((B, T - 12, C))
    for m in ("ref", "nonblank", "min_maxlp", "entropy"):
        a = confidence_scores(lp, np.array([12] * B), C - 1, m)
        b = confidence_scores(lp2, np.array([12] * B), C - 1, m)
        np.testing.assert_allclose(a, b, rtol=1e-5, err_msg=m)


@pytest.fixture
def ssl_corpus(tmp_path):
    """Manifest + offline pkl features (no audio needed)."""
    rng = np.random.default_rng(1)
    entries = []
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(10):
        dur = float(rng.uniform(1.0, 3.0))
        frames = int(dur * 50)
        feats = rng.standard_normal((1, frames, 512)).astype(np.float32)
        with open(feat_dir / f"utt{i}.pkl", "wb") as f:
            pickle.dump(feats, f)
        entries.append({
            "audio_filepath": str(tmp_path / f"utt{i}.wav"),
            "duration": dur,
            "text": "cat dog",
        })
    manifest = tmp_path / "ssl_manifest.json"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return manifest, feat_dir


def test_ssl_batcher_offline(ssl_corpus):
    manifest, feat_dir = ssl_corpus
    from lightning_asr_tpu.data.manifest import read_manifests

    vocab = Vocabulary([" ", "a", "c", "d", "g", "o", "t"])
    entries = read_manifests(manifest, 16.7)
    batcher = SSLBucketBatcher(entries, vocab, batch_size=5, ssl_folder=feat_dir,
                               train=True, bucket_seconds=(4.0,))
    batches = list(batcher)
    assert len(batches) == 2
    for b in batches:
        assert b.waves.shape == (5, 200, 512)  # 4s * 50fps
        assert b.targets.shape[1] == 32
        assert (b.wave_lens > 0).all()
        # features at padded frames are zero
        for i in range(5):
            assert np.all(b.waves[i, b.wave_lens[i]:] == 0)


def test_ssl_datamodule_pseudo_loader(ssl_corpus):
    manifest, feat_dir = ssl_corpus
    dm = SSLDataModule(
        train_manifest=str(manifest), dev_manifest=str(manifest),
        labels=[" ", "a", "c", "d", "g", "o", "t"], train_bs=5, dev_bs=5,
        ssl_folder=str(feat_dir), pseudo_manifest=str(manifest),
        bucket_seconds=(4.0,),
    )
    pseudo = dm.pseudo_train_dataloader()
    assert len(list(pseudo)) == 2

    # inject pseudo labels -> train set grows
    n_before = len(list(dm.train_dataloader(0)))
    dm.inject_pseudo_datasets([(e.audio_filepath, "cat", e.duration) for e in dm.unlabeled_entries[:5]])
    n_after = len(list(dm.train_dataloader(0)))
    assert n_after >= n_before
    # re-injection replaces, not accumulates
    dm.inject_pseudo_datasets([])
    assert len(dm.pseudo_entries) == 0


def test_pseudo_pass_carries_manifest_durations(ssl_corpus, monkeypatch):
    """The pseudo-labeling pass must inject (path, text, duration) triples
    sourced from the unlabeled manifest — feature-only corpora have no wav
    on disk for inject_pseudo_datasets' duration-probing fallback."""
    import jax.numpy as jnp

    from lightning_asr_tpu.training.ssl_trainer import SSLTrainer

    manifest, feat_dir = ssl_corpus
    labels = [" ", "a", "c", "d", "g", "o", "t"]
    dm = SSLDataModule(
        train_manifest=str(manifest), dev_manifest=str(manifest),
        labels=labels, train_bs=5, dev_bs=5, ssl_folder=str(feat_dir),
        pseudo_manifest=str(manifest), bucket_seconds=(4.0,),
    )
    vocab = dm.vocab

    trainer = SSLTrainer.__new__(SSLTrainer)
    trainer.dm = dm
    trainer.vocab = vocab
    trainer.pseudo_start_epoch = 0
    trainer.pseudo_every_n_epochs = 1
    trainer.pseudo_confidence_threshold = 100.0  # accept everything

    class _Loggers:
        def log_metrics(self, *a, **k):
            pass

    trainer.loggers = _Loggers()
    trainer._device_batch = lambda b: b

    def fake_eval_step(state, batch):
        B = batch.waves.shape[0]
        T = 8
        # decode "cat" for every utterance: c-a-t then blanks, confident
        preds = np.full((B, T), vocab.blank_id, np.int32)
        preds[:, 0] = labels.index("c")
        preds[:, 1] = labels.index("a")
        preds[:, 2] = labels.index("t")
        lp = np.full((B, T, len(labels) + 1), -10.0, np.float32)
        for t in range(T):
            for b in range(B):
                lp[b, t, preds[b, t]] = -0.01
        return {"preds": jnp.asarray(preds),
                "pred_lens": jnp.full((B,), T, jnp.int32),
                "log_probs": jnp.asarray(lp)}

    trainer._eval_step = fake_eval_step

    class _FakeStep:
        step = 0

    trainer.on_train_epoch_end(_FakeStep(), epoch=2)
    assert len(dm.pseudo_entries) == len(dm.unlabeled_entries)
    durs = {e.audio_filepath: e.duration for e in dm.unlabeled_entries}
    for e in dm.pseudo_entries:
        # duration came from the manifest, NOT from probing the (absent) wav
        assert e.duration == pytest.approx(durs[e.audio_filepath])
        assert e.text == "cat"


def test_ssl_on_resume_refresh_gating():
    """Chunked resume re-runs the pseudo pass iff a scheduled pass had
    already fired before the resume epoch (Trainer.on_resume hook)."""
    from lightning_asr_tpu.training.ssl_trainer import SSLTrainer

    t = SSLTrainer.__new__(SSLTrainer)
    t.pseudo_start_epoch = 15
    t.pseudo_every_n_epochs = 4

    class _DM:
        unlabeled_entries = [object()]

    t.dm = _DM()
    calls = []
    t._pseudo_pass = lambda state: calls.append(state)

    t.on_resume(None, 10)   # before pseudo_start: nothing fired
    assert calls == []
    # first scheduled pass is epoch 16 (15 % 4 != 0); resuming AT 16 means
    # epochs 0-15 ran, the epoch-16 pass has not happened yet
    t.on_resume(None, 16)
    assert calls == []
    t.on_resume(None, 17)   # epoch-16 pass fired before the stop
    assert len(calls) == 1
    # no unlabeled pool -> never refresh
    t.dm.unlabeled_entries = []
    t.on_resume(None, 30)
    assert len(calls) == 1
