"""StreamingTranscriber: incremental feed/partial/finish must reproduce the
offline chunked path (translate_long) exactly — same windows, same
keep-region stitch, same greedy collapse — while doing O(new frames) work
per feed and holding O(chunk) sample memory."""

import numpy as np
import pytest

import jax

from pathlib import Path

from lightning_asr_tpu.inference import AsrTranslator, StreamingTranscriber
from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.optim import novograd
from lightning_asr_tpu.training.checkpoint import CheckpointManager
from lightning_asr_tpu.training.steps import create_train_state

LABELS = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt_stream")
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
def translator(checkpoint_dir):
    return AsrTranslator(checkpoint_dir)


def _wave(seconds, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)


def test_streaming_matches_translate_long(translator, tmp_path):
    """Multi-window stream fed in ragged blocks == one-shot translate_long
    with the same chunk/overlap geometry (same windows, stitch, decode)."""
    from lightning_asr_tpu.data.audio import write_wav

    wave = _wave(11.0)
    path = tmp_path / "long.wav"
    write_wav(path, wave[None], 16000)
    offline = translator.translate_long(path, chunk_seconds=4.0,
                                        overlap_seconds=0.5)

    st = StreamingTranscriber(translator, chunk_seconds=4.0,
                              overlap_seconds=0.5)
    rng = np.random.default_rng(7)
    pos, parts = 0, []
    while pos < wave.shape[0]:
        n = int(rng.integers(1_000, 30_000))
        parts.append(st.feed(wave[pos: pos + n]))
        pos += n
    final = st.finish()
    assert final == offline
    # partials only ever append (committed text is monotone)
    for a, b in zip(parts, parts[1:]):
        assert b.startswith(a)
    assert final.startswith(parts[-1]) or translator.beam_decoder


def test_streaming_single_window_and_reuse(translator):
    """A stream shorter than one chunk flushes on finish(); feeding after
    finish raises; sample accounting is exact."""
    st = StreamingTranscriber(translator, chunk_seconds=4.0,
                              overlap_seconds=0.5)
    w = _wave(2.0, seed=3)
    st.feed(w)
    assert st.samples_fed == w.shape[0]
    out = st.finish()
    assert isinstance(out, str)
    assert st.partial() == out  # idempotent after finish
    assert st.finish() == out
    with pytest.raises(RuntimeError):
        st.feed(w)


def test_streaming_bounded_buffer(translator):
    """Consumed samples are dropped: the retained buffer never exceeds one
    chunk + one unprocessed hop (+ the largest single block)."""
    st = StreamingTranscriber(translator, chunk_seconds=4.0,
                              overlap_seconds=0.5)
    block = _wave(1.0, seed=4)
    for _ in range(20):  # 20 s through a 4 s window
        st.feed(block)
        held = sum(p.size for p in st._buf)
        assert held <= st.chunk + st.hop + block.size
    assert st._buf_start + sum(p.size for p in st._buf) == st.samples_fed


def test_finish_window_reads_real_samples(translator):
    """The final right-aligned window can start BEFORE the next hop
    boundary (whenever the stream ends within 2*overlap of a hop); its
    input must be the true samples, not zero-fill.  Regression:
    _drop_consumed freed everything below _next_start, so small-block
    feeds dropped the final window's left context and finish() silently
    computed it over zeros, diverging from translate_long on real audio."""
    wave = _wave(11.0, seed=9)
    st = StreamingTranscriber(translator, chunk_seconds=4.0,
                              overlap_seconds=0.5)
    captured = []
    orig = translator._jit_forward

    def capturing(w, lens):
        captured.append(np.asarray(w)[0].copy())
        return orig(w, lens)

    translator._jit_forward = capturing
    try:
        for pos in range(0, wave.shape[0], 1000):
            st.feed(wave[pos: pos + 1000])
        st.finish()
    finally:
        translator._jit_forward = orig
    final_start = wave.shape[0] - st.chunk
    assert final_start < st._next_start  # the regression's trigger geometry
    np.testing.assert_array_equal(captured[-1], wave[final_start:])


def test_streaming_geometry_validation(translator):
    with pytest.raises(ValueError):
        StreamingTranscriber(translator, chunk_seconds=1.0,
                             overlap_seconds=0.5)


def test_streaming_empty_stream(translator):
    st = StreamingTranscriber(translator, chunk_seconds=4.0,
                              overlap_seconds=0.5)
    assert st.finish() == ""
