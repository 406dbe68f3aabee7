"""Inference API + HTTP server: checkpoint -> AsrTranslator -> transcription
via path, BytesIO, manifest eval, and the stdlib POST / server contract."""

import io
import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest

import jax

from lightning_asr_tpu.data.audio import write_wav
from lightning_asr_tpu.data.vocab import Vocabulary
from lightning_asr_tpu.inference import AsrTranslator
from lightning_asr_tpu.inference.server import make_stdlib_server
from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.optim import novograd
from lightning_asr_tpu.training.checkpoint import CheckpointManager
from lightning_asr_tpu.training.steps import create_train_state

LABELS = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """Save an (untrained) checkpoint with hparams, as the Trainer would."""
    root = tmp_path_factory.mktemp("ckpt")
    model = build_model(num_classes=len(LABELS) + 1, mask=True)
    opt = novograd(1e-3, betas=(0.8, 0.5))
    state = create_train_state(model, opt, jax.random.PRNGKey(0))
    mgr = CheckpointManager(root, top_k=1)
    mgr.save(state, epoch=0, metrics={"val_wer": 1.0},
             hparams={"labels": LABELS, "use_cer": False,
                      "encoder": "quartznet12_context", "mask": True,
                      "drop_rate": 0.0})
    return str(Path(root) / "last")


@pytest.fixture(scope="module")
def wav_path(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("audio") / "test.wav"
    write_wav(path, (rng.standard_normal(16000) * 0.1).astype(np.float32)[None], 16000)
    return str(path)


def test_translate_path_and_bytesio(checkpoint_dir, wav_path):
    tr = AsrTranslator(checkpoint_dir)
    assert tr.vocab.labels == LABELS
    out1 = tr.translate(wav_path)
    assert isinstance(out1, str)
    with open(wav_path, "rb") as f:
        out2 = tr.translate(io.BytesIO(f.read()))
    assert out1 == out2  # deterministic eval path, dither off


def test_evaluate_manifest_with_csv(checkpoint_dir, wav_path, tmp_path):
    manifest = tmp_path / "m.json"
    with open(manifest, "w") as f:
        f.write(json.dumps({"audio_filepath": wav_path, "duration": 1.0,
                            "text": "hello"}) + "\n")
    tr = AsrTranslator(checkpoint_dir)
    csv_path = tmp_path / "report.csv"
    result = tr.evaluate_manifest(manifest, batch_size=2, csv_path=csv_path)
    assert result["n_utterances"] == 1
    assert "wer" in result
    assert csv_path.exists() and "audio_filepath" in csv_path.read_text()


def test_dynamic_batcher(checkpoint_dir, wav_path):
    """Concurrent requests share a device batch and all get correct text."""
    import concurrent.futures

    from lightning_asr_tpu.inference.server import DynamicBatcher

    tr = AsrTranslator(checkpoint_dir)
    expected = tr.translate(wav_path)
    batcher = DynamicBatcher(tr, max_batch=4, max_wait_ms=50)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        results = list(pool.map(lambda _: batcher.translate(wav_path), range(4)))
    assert results == [expected] * 4


def test_http_server_contract(checkpoint_dir, wav_path):
    tr = AsrTranslator(checkpoint_dir)
    expected = tr.translate(wav_path)

    # warmup_seconds pre-compiles the (batch, bucket) ladder the server
    # will hit — the production cold-start path
    server = make_stdlib_server(tr, "127.0.0.1", 0, batching=True,
                                max_wait_ms=10, max_batch=2,
                                warmup_seconds=(1.0,))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        boundary = "testboundary123"
        with open(wav_path, "rb") as f:
            payload = f.read()
        body = (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="audio"; filename="t.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/", data=body,
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
            assert resp.read().decode("utf-8") == expected
    finally:
        server.shutdown()


def test_plan_chunks_tiles_exactly():
    from lightning_asr_tpu.inference.predict import plan_chunks

    for n, chunk, overlap in [(100, 120, 10), (1000, 300, 50), (1001, 300, 50),
                              (301, 300, 50), (900, 300, 50), (10**6, 16000 * 20, 16000 * 2)]:
        plans = plan_chunks(n, chunk, overlap)
        covered = []
        for start, keep_lo, keep_hi in plans:
            assert 0 <= start and start + chunk >= start + keep_hi
            assert 0 <= keep_lo <= keep_hi <= chunk
            covered.append((start + keep_lo, start + keep_hi))
        # keep-regions exactly partition [0, n)
        assert covered[0][0] == 0 and covered[-1][1] == n
        for (a0, a1), (b0, b1) in zip(covered, covered[1:]):
            assert a1 == b0, (covered, n, chunk, overlap)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        plan_chunks(100, 20, 10)


def test_translate_long(checkpoint_dir, tmp_path):
    """Chunked path: short audio falls through to translate(); long audio
    stitches chunks into one decode without recompiling per chunk-count."""
    rng = np.random.default_rng(1)
    short = tmp_path / "short.wav"
    write_wav(short, (rng.standard_normal(16000) * 0.1).astype(np.float32)[None], 16000)
    long = tmp_path / "long.wav"
    write_wav(long, (rng.standard_normal(16000 * 11) * 0.1).astype(np.float32)[None], 16000)

    tr = AsrTranslator(checkpoint_dir)
    assert tr.translate_long(short, chunk_seconds=4.0, overlap_seconds=0.5) \
        == tr.transcribe_batch([np.asarray(read_audio_short(short))])[0]
    out = tr.translate_long(long, chunk_seconds=4.0, overlap_seconds=0.5)
    assert isinstance(out, str)


def read_audio_short(path):
    from lightning_asr_tpu.data.audio import read_audio

    return read_audio(path, mono=True)[0][0]


def test_batch_dim_bucketing(checkpoint_dir):
    """transcribe_batch pads the batch dim to a power of two (compile reuse
    for arbitrary caller batch sizes, e.g. the serving DynamicBatcher) and
    trims outputs — an odd-size batch must match per-utterance results."""
    rng = np.random.default_rng(2)
    waves = [(rng.standard_normal(16000 + 777 * i) * 0.1).astype(np.float32)
             for i in range(3)]
    tr = AsrTranslator(checkpoint_dir)
    batched = tr.transcribe_batch(waves)
    assert len(batched) == 3
    singles = [tr.transcribe_batch([w])[0] for w in waves]
    assert batched == singles


def test_warmup_covers_padded_max_batch(checkpoint_dir):
    """transcribe_batch pads to the NEXT power of two, so warmup must
    compile through pow2(max_batch) — a non-power-of-two max_batch (12)
    otherwise leaves the Bp=16 shape cold and the first full burst stalls
    at XLA-compile latency (found by review)."""
    tr = AsrTranslator(checkpoint_dir)
    seen = []
    tr.transcribe_batch = lambda waves, **kw: seen.append(len(waves))
    tr.warmup(seconds=(1.0,), max_batch=12)
    assert max(seen) >= 16, seen
    seen.clear()
    tr.warmup(seconds=(1.0,), max_batch=8)  # exact power of two: no overshoot
    assert max(seen) == 8, seen


class _FakeTranslator:
    """Minimal AsrTranslator stand-in for batcher-level tests (no model)."""

    class _FE:
        sample_rate = 16000

    frontend = _FE()

    def __init__(self, delay=0.0):
        self.delay = delay
        self.calls = []

    def transcribe_batch(self, waves):
        import time as _t

        if self.delay:
            _t.sleep(self.delay)
        self.calls.append(len(waves))
        return [f"len{w.shape[0]}" for w in waves]


def _wav_bytes(n=1600, sr=16000):
    import struct

    pcm = b"\x00\x00" * n
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def test_dynamic_batcher_sheds_on_overload():
    """Bounded queue: overflow raises ServerOverloaded (HTTP 503) instead of
    queueing unboundedly (VERDICT r3 #4 — c32 latency collapse)."""
    import concurrent.futures

    from lightning_asr_tpu.inference.server import DynamicBatcher, ServerOverloaded

    tr = _FakeTranslator(delay=0.3)
    b = DynamicBatcher(tr, max_batch=1, max_wait_ms=1, max_queue=2)
    blob = _wav_bytes()
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        futs = [pool.submit(b.translate, blob) for _ in range(8)]
        results, shed = [], 0
        for f in futs:
            try:
                results.append(f.result(timeout=30))
            except ServerOverloaded:
                shed += 1
    assert shed >= 1, "no request was shed at 8x overload of a queue of 2"
    assert all(r == "len1600" for r in results)


def test_dynamic_batcher_decodes_batch_and_rejects_bad_rows():
    """The worker decodes per device batch (native pool when available);
    malformed bodies and wrong sample rates fail their own request with
    ValueError without poisoning batch-mates."""
    import concurrent.futures

    from lightning_asr_tpu.inference.server import DynamicBatcher

    tr = _FakeTranslator()
    b = DynamicBatcher(tr, max_batch=4, max_wait_ms=50)
    good = _wav_bytes(3200)
    bad = b"definitely not a wav"
    wrong_sr = _wav_bytes(800, sr=8000)
    with concurrent.futures.ThreadPoolExecutor(3) as pool:
        f_good = pool.submit(b.translate, good)
        f_bad = pool.submit(b.translate, bad)
        f_sr = pool.submit(b.translate, wrong_sr)
        assert f_good.result(timeout=30) == "len3200"
        with pytest.raises(ValueError):
            f_bad.result(timeout=30)
        with pytest.raises(ValueError):
            f_sr.result(timeout=30)


def test_device_loop_pipelines_two_batches_in_flight():
    """The device loop double-buffers: batch N+1 is SUBMITTED before batch
    N's resolver is called (hides the host<->device round-trip on remote
    backends), and every future still gets its own batch's result."""
    import concurrent.futures
    import threading
    import time as _t

    from lightning_asr_tpu.inference.server import DynamicBatcher

    events = []
    lock = threading.Lock()

    class _PipelinedFake(_FakeTranslator):
        def transcribe_batch_submit(self, waves):
            with lock:
                events.append(("submit", len(waves)))

            def resolve(waves=waves):
                _t.sleep(0.15)  # the blocking fetch
                with lock:
                    events.append(("resolve", len(waves)))
                return [f"len{w.shape[0]}" for w in waves]

            return resolve

    tr = _PipelinedFake()
    b = DynamicBatcher(tr, max_batch=2, max_wait_ms=30)
    blob = _wav_bytes(1600)
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        futs = [pool.submit(b.translate, blob) for _ in range(8)]
        assert all(f.result(timeout=30) == "len1600" for f in futs)
    kinds = [k for k, _ in events]
    assert kinds.count("submit") == kinds.count("resolve") >= 2
    # at least one second submit happened before the first resolve
    first_resolve = kinds.index("resolve")
    assert kinds[:first_resolve].count("submit") >= 2, (
        f"no overlap: {events}")


def test_resolve_batching_auto(monkeypatch):
    """'auto' picks batched only on multi-core hosts (SERVING_BENCH: the
    batcher's device loop starves against HTTP threads on few cores)."""
    import os

    from lightning_asr_tpu.inference.server import resolve_batching

    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    assert resolve_batching("auto") is False
    monkeypatch.setattr(os, "cpu_count", lambda: 8)
    assert resolve_batching("auto") is True
    assert resolve_batching("on") is True and resolve_batching(True) is True
    assert resolve_batching("off") is False and resolve_batching(None) is False
    with pytest.raises(ValueError):
        resolve_batching("maybe")
