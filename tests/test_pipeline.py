"""Bucket batcher: static shapes, crop semantics, epoch shuffling, prefetch."""

import json
import os
from pathlib import Path

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


@pytest.mark.parametrize("wire_dtype", ["int16", "float32", "mulaw8"])
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
    expect_dtype = {"int16": np.int16, "float32": np.float32,
                    "mulaw8": np.uint8}[wire_dtype]
    checked = 0
    for b in batcher:
        assert b.waves.dtype == expect_dtype
        for i in range(len(b.paths)):
            with wave_mod.open(b.paths[i]) as w:
                pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
            got = np.asarray(b.waves[i, : b.wave_lens[i]])
            assert b.wave_lens[i] == len(pcm)
            if wire_dtype == "int16":
                np.testing.assert_array_equal(got, pcm)
            elif wire_dtype == "mulaw8":
                # the TRANSPORT is exact: codes are exactly the LUT of the
                # file's PCM, and padding is exactly the silence code 128
                from lightning_asr_tpu.data.pipeline import mulaw_encode

                np.testing.assert_array_equal(got, mulaw_encode(pcm))
                np.testing.assert_array_equal(
                    np.asarray(b.waves[i, b.wave_lens[i]:]), 128)
            else:
                np.testing.assert_allclose(got, pcm.astype(np.float32) / 32768.0,
                                           atol=1.0 / 32768.0)
            checked += 1
    assert checked == 8


def test_mulaw_roundtrip_and_device_expansion():
    """mu-law encode (host LUT) -> device expansion (frontend) must equal the
    host reference decode bit-for-bit-ish (1 ulp), reach telephony-grade SNR
    on speech-like audio, and map silence codes to exactly 0."""
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.data.pipeline import mulaw_decode_host, mulaw_encode
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig, log_mel_spectrogram

    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    wave = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.01 * rng.standard_normal(16000)).astype(np.float32)
    pcm = np.round(wave * 32768.0).clip(-32768, 32767).astype(np.int16)
    codes = mulaw_encode(pcm)
    dec = mulaw_decode_host(codes)

    # SNR of the companded round trip vs the original samples
    x = pcm.astype(np.float64) / 32768.0
    snr = 10 * np.log10((x ** 2).sum() / ((x - dec.astype(np.float64)) ** 2).sum())
    assert snr > 30.0, snr
    assert mulaw_encode(np.zeros(4, np.int16)).tolist() == [128] * 4
    np.testing.assert_array_equal(mulaw_decode_host(np.full(4, 128, np.uint8)), 0.0)

    # device expansion (the exact in-graph function the frontend applies)
    # vs the host reference: 1-ulp-level agreement on the waveform
    from lightning_asr_tpu.ops.frontend import expand_wire

    dev = np.asarray(jax.jit(expand_wire)(jnp.asarray(codes)))
    np.testing.assert_allclose(dev, dec, rtol=0, atol=2e-7)

    # and end-to-end through the frontend: uint8 wire vs host-decoded floats
    # (dB scale amplifies ulp noise in near-silent bins; 0.01 dB bound)
    cfg = MelFrontendConfig(precision="highest", dither=0.0)
    lens = np.asarray([16000], np.int32)
    mel_u8, l1 = log_mel_spectrogram(jnp.asarray(codes[None]), jnp.asarray(lens), cfg, rng=None)
    mel_f32, l2 = log_mel_spectrogram(jnp.asarray(dec[None]), jnp.asarray(lens), cfg, rng=None)
    np.testing.assert_allclose(np.asarray(mel_u8), np.asarray(mel_f32),
                               rtol=0, atol=1e-2)
    assert int(l1[0]) == int(l2[0])


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


def test_mmap_cache_matches_ram_and_survives_restart(corpus, tmp_path):
    """cache='mmap' (wave_cache.MmapWaveCache) must serve byte-identical
    batches to the RAM dict, and a FRESH instance (= a chunked-resume
    restart of a long run) must serve them with zero decode."""
    from lightning_asr_tpu.data.wave_cache import MmapWaveCache

    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    kw = dict(batch_size=2, train=False, bucket_seconds=(1.0, 2.0, 4.0),
              crop=False)
    ram: dict = {}
    mm = MmapWaveCache(tmp_path / "wc")
    ram_batches = list(BucketBatcher(entries, vocab, wave_cache=ram, **kw))
    mm_batches = list(BucketBatcher(entries, vocab, wave_cache=mm, **kw))
    for br, bm in zip(ram_batches, mm_batches):
        assert br.paths == bm.paths
        np.testing.assert_array_equal(br.waves, bm.waves)
        np.testing.assert_array_equal(br.wave_lens, bm.wave_lens)
    assert len(mm) == 8

    # restart: fresh instance, decode forbidden (native loader + python
    # reader both booby-trapped) — everything must come from the mmap file
    import lightning_asr_tpu.data.pipeline as pl
    import lightning_asr_tpu.native as native
    from unittest import mock

    mm.close()
    mm2 = MmapWaveCache(tmp_path / "wc")
    assert len(mm2) == 8
    with mock.patch.object(native, "load_wav_batch",
                           side_effect=AssertionError("decoded on restart")), \
         mock.patch.object(pl, "read_audio",
                           side_effect=AssertionError("decoded on restart")):
        again = list(BucketBatcher(entries, vocab, wave_cache=mm2, **kw))
    for br, ba in zip(ram_batches, again):
        np.testing.assert_array_equal(br.waves, ba.waves)


def test_mmap_cache_crash_safety(corpus, tmp_path):
    """A torn/overrun index tail (crash mid-append) must be dropped on
    reopen and the lost utterances re-decoded into consistent positions."""
    import json as json_mod

    from lightning_asr_tpu.data.wave_cache import MmapWaveCache

    d = tmp_path / "wc"
    mm = MmapWaveCache(d)
    rng = np.random.default_rng(0)
    w1 = (rng.standard_normal(100) * 1000).astype(np.int16)
    w2 = (rng.standard_normal(150) * 1000).astype(np.int16)
    mm["a"] = w1
    mm["b"] = w2
    mm.close()

    # simulate: index line written but samples lost (truncate the bin), plus
    # a torn final line
    with open(d / "waves.bin", "r+b") as f:
        f.truncate(100 * 2)  # drop w2's samples
    with open(d / "index.jsonl", "a") as f:
        f.write('{"p": "c", "o"')  # torn write

    mm2 = MmapWaveCache(d)
    assert "a" in mm2 and "b" not in mm2 and "c" not in mm2
    np.testing.assert_array_equal(mm2["a"], w1)
    mm2["b"] = w2  # re-decode appends cleanly
    np.testing.assert_array_equal(mm2["b"], w2)
    mm2.close()
    mm3 = MmapWaveCache(d)
    np.testing.assert_array_equal(mm3["b"], w2)
    assert json_mod.loads((d / "index.jsonl").read_text().splitlines()[-1])["p"] == "b"


def test_mmap_cache_rejects_non_int16(tmp_path):
    from lightning_asr_tpu.data.wave_cache import MmapWaveCache

    mm = MmapWaveCache(tmp_path / "wc")
    with pytest.raises(TypeError):
        mm["x"] = np.zeros(4, np.float32)


def test_datamodule_mmap_cache_wiring(corpus, tmp_path):
    """AsrDataModule(cache='mmap') builds the persistent cache next to the
    manifest (or at cache_dir) and batches equal the cache=None path."""
    from lightning_asr_tpu.data import AsrDataModule

    dm_plain = AsrDataModule(train_manifest=str(corpus), dev_manifest=str(corpus),
                             labels=LABELS, train_bs=2, dev_bs=2,
                             bucket_seconds=(1.0, 2.0, 4.0), crop=False)
    dm_mm = AsrDataModule(train_manifest=str(corpus), dev_manifest=str(corpus),
                          labels=LABELS, train_bs=2, dev_bs=2,
                          bucket_seconds=(1.0, 2.0, 4.0), crop=False,
                          cache="mmap", cache_dir=tmp_path / "wc")
    for bp, bm in zip(dm_plain.val_dataloader(), dm_mm.val_dataloader()):
        np.testing.assert_array_equal(bp.waves, bm.waves)
    assert (tmp_path / "wc" / "waves.bin").exists()
    with pytest.raises(ValueError):
        AsrDataModule(train_manifest=str(corpus), labels=LABELS, cache="disk")


def test_mmap_cache_orphaned_tail(tmp_path):
    """Samples flushed whose index line never landed (crash inside
    __setitem__) must be truncated on reopen — otherwise every later append
    writes at the physical end of the bin but is indexed at _end, shifting
    all subsequent reads (found by review: reads returned garbage)."""
    from lightning_asr_tpu.data.wave_cache import MmapWaveCache

    d = tmp_path / "wc"
    mm = MmapWaveCache(d)
    w1 = np.arange(100, dtype=np.int16)
    mm["a"] = w1
    mm.close()
    # orphaned tail: samples hit the disk, index line did not
    with open(d / "waves.bin", "ab") as f:
        f.write(np.full(50, 7, np.int16).tobytes())

    mm2 = MmapWaveCache(d)
    w2 = np.arange(1000, 1150, dtype=np.int16)
    mm2["b"] = w2
    np.testing.assert_array_equal(mm2["a"], w1)
    np.testing.assert_array_equal(mm2["b"], w2)
    mm2.close()
    mm3 = MmapWaveCache(d)  # and after a reopen
    np.testing.assert_array_equal(mm3["b"], w2)


def test_cached_decode_native_runtime_error_falls_back(corpus, monkeypatch):
    """The cached path must fall back to the python reader on RuntimeError
    (native decode refusal) with the same breadth as the non-cached path."""
    import lightning_asr_tpu.native as native

    monkeypatch.setattr(native, "load_wav_batch",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("native decode failed")))
    entries = read_manifests(corpus, 16.7)
    vocab = Vocabulary(LABELS)
    cache: dict = {}
    batcher = BucketBatcher(entries, vocab, batch_size=2, train=False,
                            bucket_seconds=(1.0, 2.0, 4.0), crop=False,
                            wave_cache=cache)
    assert sum(b.size for b in batcher) == 8 and len(cache) == 8


def test_cached_decode_full_file_despite_understated_duration(tmp_path):
    """A manifest row that understates a file's duration must not freeze a
    truncated waveform into the cache: a second row with the true duration
    (same path) must still see the full samples (native loader clamps at
    the buffer, so a full buffer triggers a true-length re-decode)."""
    rng = np.random.default_rng(0)
    n_true = int(16000 * 1.9)
    wave = (rng.standard_normal(n_true) * 0.1).astype(np.float32)
    path = tmp_path / "long.wav"
    write_wav(path, wave[None], 16000)
    manifest = tmp_path / "m.json"
    with open(manifest, "w") as f:
        # row A understates (0.5 s); row B states the true duration
        f.write(json.dumps({"audio_filepath": str(path), "duration": 0.5,
                            "text": "ab"}) + "\n")
        f.write(json.dumps({"audio_filepath": str(path), "duration": 1.9,
                            "text": "ab"}) + "\n")
    entries = read_manifests(manifest, 16.7)
    vocab = Vocabulary(LABELS)
    kw = dict(batch_size=1, train=False, bucket_seconds=(1.0, 2.0), crop=False)
    plain = list(BucketBatcher(entries, vocab, **kw))
    cached = list(BucketBatcher(entries, vocab, wave_cache={}, **kw))
    assert len(plain) == len(cached) == 2
    for bp, bc in zip(plain, cached):
        np.testing.assert_array_equal(bp.waves, bc.waves)
        np.testing.assert_array_equal(bp.wave_lens, bc.wave_lens)


def test_mmap_cache_staleness_and_writer_lock(tmp_path):
    """Round-4 hardening: a regenerated source wav must not be served stale
    (size/mtime recorded per entry, mismatch -> re-decode), and a second
    writer process on one cache dir must fail fast instead of interleaving
    appends (exclusive flock)."""
    import json as json_mod

    from lightning_asr_tpu.data.wave_cache import MmapWaveCache

    d = tmp_path / "wc"
    src = tmp_path / "a.wav"
    src.write_bytes(b"\x01\x02" * 100)
    w1 = np.arange(8, dtype=np.int16)
    mm = MmapWaveCache(d)
    mm[str(src)] = w1
    assert str(src) in mm
    np.testing.assert_array_equal(mm[str(src)], w1)

    # replace the source file: a FRESH cache instance must treat the entry
    # as a miss and accept the re-decode (same-process instances have
    # already validated the path this epoch)
    src.write_bytes(b"\x03\x04" * 120)
    os.utime(src, ns=(1, 1))
    mm.close()
    mm2 = MmapWaveCache(d)
    assert str(src) not in mm2
    w2 = np.arange(10, dtype=np.int16) * 3
    mm2[str(src)] = w2
    np.testing.assert_array_equal(mm2[str(src)], w2)
    # the replacement persists across reopen
    mm2.close()
    mm3 = MmapWaveCache(d)
    np.testing.assert_array_equal(mm3[str(src)], w2)

    # legacy entries (no source metadata) stay trusted
    lines = (d / "index.jsonl").read_text().splitlines()
    rec = json_mod.loads(lines[-1])
    rec.pop("s"), rec.pop("m")
    rec["p"] = "legacy-entry"
    (d / "index.jsonl").write_text("\n".join(lines + [json_mod.dumps(rec)]) + "\n")
    mm3.close()
    mm4 = MmapWaveCache(d)
    assert "legacy-entry" in mm4

    # writer exclusivity: a concurrent writer in another process errors
    import subprocess
    import sys as sys_mod

    code = (
        "import numpy as np, sys; sys.path.insert(0, %r)\n"
        "from lightning_asr_tpu.data.wave_cache import MmapWaveCache\n"
        "mm = MmapWaveCache(%r)\n"
        "try:\n"
        "    mm['other'] = np.ones(4, np.int16)\n"
        "    print('NO-LOCK')\n"
        "except RuntimeError:\n"
        "    print('LOCKED')\n"
    ) % (str(Path(__file__).resolve().parents[1]), str(d))
    mm4["holder"] = np.ones(4, np.int16)  # acquires the flock
    out = subprocess.run([sys_mod.executable, "-c", code], capture_output=True,
                         text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "LOCKED" in out.stdout, out.stdout + out.stderr
    mm4.close()  # releases the lock -> a new writer succeeds
    out = subprocess.run([sys_mod.executable, "-c", code], capture_output=True,
                         text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "NO-LOCK" in out.stdout, out.stdout + out.stderr


def test_wave_crop_in_graph_semantics():
    """ops.augment.wave_crop (device_cache replay crop) reproduces the
    reference sub_secquence semantics in-graph: window [offset, target),
    target >= 0.98*len, rows shifted to start 0, zero tail, preemph prev
    sample = wave[offset-1] (/root/reference/data_module.py:138-148)."""
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.ops.augment import wave_crop

    B, S = 8, 4000
    lens = np.asarray([4000, 3500, 3000, 2500, 2000, 1500, 1000, 500], np.int32)
    # distinct, strictly positive samples so offsets are recoverable
    waves = (np.arange(S, dtype=np.float32)[None, :] + 1.0).repeat(B, axis=0)
    for i, n in enumerate(lens):
        waves[i, n:] = 0.0
    out, new_lens, prevs = jax.jit(wave_crop)(
        jnp.asarray(waves), jnp.asarray(lens), jax.random.PRNGKey(3))
    out, new_lens, prevs = np.asarray(out), np.asarray(new_lens), np.asarray(prevs)
    for i, n in enumerate(lens):
        nl = int(new_lens[i])
        offset = int(out[i, 0] - 1.0)  # first kept sample recovers offset
        target = offset + nl
        assert 0 < nl <= n
        assert target >= int(n * 0.98) - 1, (i, target, n)  # reference floor
        assert target <= n
        assert 0 <= offset <= n - target + 1
        np.testing.assert_array_equal(out[i, :nl], waves[i, offset:offset + nl])
        assert not out[i, nl:].any(), i  # zero tail
        expect_prev = waves[i, offset - 1] if offset > 0 else 0.0
        np.testing.assert_allclose(prevs[i], expect_prev, rtol=1e-6)


def test_wave_crop_int16_wire():
    """int16 wire batches crop in-graph too; prev sample is rescaled to the
    float domain the frontend's preemphasis expects."""
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.ops.augment import wave_crop

    rng = np.random.default_rng(0)
    waves = rng.integers(-3000, 3000, size=(4, 2000)).astype(np.int16)
    lens = np.full(4, 2000, np.int32)
    out, new_lens, prevs = jax.jit(wave_crop)(
        jnp.asarray(waves), jnp.asarray(lens), jax.random.PRNGKey(0))
    assert np.asarray(out).dtype == np.int16
    assert prevs.dtype == jnp.float32
    assert float(np.abs(np.asarray(prevs)).max()) <= 1.0
