"""Bucket batcher: static shapes, crop semantics, epoch shuffling, prefetch."""

import json

import numpy as np
import pytest

from lightning_asr_tpu.data.audio import write_wav
from lightning_asr_tpu.data.manifest import read_manifests
from lightning_asr_tpu.data.pipeline import BucketBatcher, prefetch
from lightning_asr_tpu.data.vocab import Vocabulary
from lightning_asr_tpu.ops.augment import sub_sequence_crop

LABELS = [" ", "a", "b", "c"]


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    durations = [0.5, 0.6, 1.4, 1.5, 3.0, 0.55, 0.58, 1.45]
    for i, dur in enumerate(durations):
        n = int(16000 * dur)
        path = tmp_path / f"u{i}.wav"
        write_wav(path, (rng.standard_normal(n) * 0.1).astype(np.float32)[None], 16000)
        rows.append({"audio_filepath": str(path), "duration": n / 16000, "text": "ab c"})
    manifest = tmp_path / "m.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def test_bucket_static_shapes(corpus):
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    batcher = BucketBatcher(entries, vocab, batch_size=2, train=False,
                            bucket_seconds=(1.0, 2.0, 4.0), crop=False)
    shapes = set()
    n_items = 0
    for b in batcher:
        shapes.add(b.waves.shape[1])
        n_items += b.size
        assert b.waves.shape[1] in (16000, 32000, 64000)
        assert (b.wave_lens <= b.waves.shape[1]).all()
        assert b.targets.shape[1] % 32 == 0
        # padding is exactly zero
        for i in range(b.size):
            assert np.all(b.waves[i, b.wave_lens[i]:] == 0)
    assert n_items == 8  # eval mode keeps everything
    assert shapes == {16000, 32000, 64000}


def test_train_drop_last_and_shuffle(corpus):
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    batcher = BucketBatcher(entries, vocab, batch_size=2, train=True,
                            bucket_seconds=(1.0, 2.0, 4.0), crop=False, seed=1)
    batcher.set_epoch(0)
    order0 = [tuple(b.paths) for b in batcher]
    batcher.set_epoch(1)
    order1 = [tuple(b.paths) for b in batcher]
    assert order0 != order1  # epoch reshuffling
    # drop_last: the 3.0s utterance is alone in its bucket -> dropped
    n = sum(len(p) for p in order0)
    assert n <= 7 and all(len(p) == 2 for p in order0)


@pytest.mark.parametrize("wire_dtype", ["int16", "float32"])
@pytest.mark.parametrize("force_fallback", [False, True])
def test_wave_content_exact(corpus, wire_dtype, force_fallback, monkeypatch):
    """Batch waves must be EXACTLY the file's PCM samples (regression: an
    int16->float64 np.where promotion made _assemble re-scale by 32768 and
    saturate every sample to +/-32767 — train/val stayed self-consistent so
    only predict-vs-val parity caught it)."""
    import wave as wave_mod

    if force_fallback:
        import lightning_asr_tpu.data.pipeline as pl

        def _boom(*a, **k):
            raise RuntimeError("forced fallback")

        monkeypatch.setattr("lightning_asr_tpu.native.load_wav_batch", _boom)
        assert pl  # fallback path goes through read_audio
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    batcher = BucketBatcher(entries, vocab, batch_size=2, train=False,
                            bucket_seconds=(1.0, 2.0, 4.0), crop=False,
                            wire_dtype=wire_dtype)
    checked = 0
    for b in batcher:
        assert b.waves.dtype == (np.int16 if wire_dtype == "int16" else np.float32)
        for i in range(len(b.paths)):
            with wave_mod.open(b.paths[i]) as w:
                pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
            got = np.asarray(b.waves[i, : b.wave_lens[i]])
            assert b.wave_lens[i] == len(pcm)
            if wire_dtype == "int16":
                np.testing.assert_array_equal(got, pcm)
            else:
                np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0,
                                           atol=1.0 / 32768.0)
            checked += 1
    assert checked == 8


def test_crop_semantics():
    rng = np.random.default_rng(0)
    for _ in range(100):
        offset, length = sub_sequence_crop(16000, rng, weight=0.98)
        # reference: slice [location:target_length], target >= 0.98*L
        assert 0 < length <= 16000
        assert offset + length <= 16000
        assert length >= int(0.98 * 16000) - offset


def test_prefetch_order_and_error():
    assert list(prefetch(iter(range(5)))) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("inner")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="inner"):
        list(it)


@pytest.mark.parametrize("crop", [False, True])
def test_ram_cache_matches_uncached(corpus, crop):
    """cache='ram' must produce byte-identical batches to the decode path,
    for eval and for train-time crops, across epochs (decode happens once)."""
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    kw = dict(batch_size=2, train=crop, bucket_seconds=(1.0, 2.0, 4.0),
              crop=crop, seed=3)
    cache: dict = {}
    for epoch in (0, 1):
        plain = BucketBatcher(entries, vocab, **kw)
        cached = BucketBatcher(entries, vocab, wave_cache=cache, **kw)
        plain.set_epoch(epoch)
        cached.set_epoch(epoch)
        for bp, bc in zip(plain, cached):
            assert bp.paths == bc.paths
            np.testing.assert_array_equal(bp.waves, bc.waves)
            np.testing.assert_array_equal(bp.wave_lens, bc.wave_lens)
            np.testing.assert_allclose(bp.prev_samples, bc.prev_samples,
                                       atol=1.0 / 32768.0)
    # every EMITTED file cached (train mode drops the last incomplete batch,
    # so untouched files stay undecoded — laziness is the point)
    assert len(cache) == (8 if not crop else 6)


def test_ram_cache_python_fallback(corpus, monkeypatch):
    """Cache population must also work without the native loader."""
    import lightning_asr_tpu.native as native

    monkeypatch.setattr(native, "load_wav_batch",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("no lib")))
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    cache: dict = {}
    batcher = BucketBatcher(entries, vocab, batch_size=2, train=False,
                            bucket_seconds=(1.0, 2.0, 4.0), crop=False,
                            wave_cache=cache)
    total = sum(b.size for b in batcher)
    assert total == 8 and len(cache) == 8
    assert all(w.dtype == np.int16 for w in cache.values())
