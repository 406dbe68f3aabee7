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
