"""Dual-stream SSL model + batcher shapes and a dual train step smoke."""

import json
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightning_asr_tpu.data.audio import write_wav
from lightning_asr_tpu.data.manifest import read_manifests
from lightning_asr_tpu.data.vocab import Vocabulary
from lightning_asr_tpu.models.dual_stream import DUAL_MEL_CONFIG, DualStreamAsrModel
from lightning_asr_tpu.ssl_codec.dual_datamodule import DualSSLBucketBatcher


def test_dual_model_shapes():
    model = DualStreamAsrModel(num_classes=29, mask=True)
    rng = jax.random.PRNGKey(0)
    w2v = jax.random.normal(rng, (2, 100, 512))
    mel = jax.random.normal(rng, (2, 98, 64))  # slightly different length
    percents = jnp.array([1.0, 0.6])
    variables = model.init({"params": rng, "dropout": rng}, w2v, mel, percents, False)
    out, lens = model.apply(variables, w2v, mel, percents, False)
    assert out.shape == (2, 49, 29)  # min(100, 98) = 98 -> stride 2 -> 49
    np.testing.assert_allclose(np.exp(np.asarray(out[0, 0])).sum(), 1.0, rtol=1e-5)


@pytest.fixture
def dual_corpus(tmp_path):
    rng = np.random.default_rng(2)
    entries = []
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    for i in range(4):
        dur = 1.0
        n = int(16000 * dur)
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        write_wav(tmp_path / f"utt{i}.wav", wave[None], 16000)
        frames = int(dur * 50)
        with open(feat_dir / f"utt{i}.pkl", "wb") as f:
            pickle.dump(rng.standard_normal((1, frames, 512)).astype(np.float32), f)
        entries.append({"audio_filepath": str(tmp_path / f"utt{i}.wav"),
                        "duration": dur, "text": "ab"})
    manifest = tmp_path / "m.json"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return manifest, feat_dir


def test_dual_batcher_shapes(dual_corpus):
    manifest, feat_dir = dual_corpus
    vocab = Vocabulary(["a", "b"])
    entries = read_manifests(manifest, 16.7)
    batcher = DualSSLBucketBatcher(entries, vocab, batch_size=4, ssl_folder=feat_dir,
                                   train=True, bucket_seconds=(2.0,))
    (batch,) = list(batcher)
    assert batch.waves.shape == (4, 100, 512)   # 2s * 50fps
    assert batch.extra["raw_waves"].shape == (4, 32000)  # 2s * 16k
    assert (batch.extra["raw_wave_lens"] == 16000).all()


def test_dual_train_step_runs(dual_corpus):
    from lightning_asr_tpu.optim import novograd
    from lightning_asr_tpu.training.steps import AsrTrainState, make_dual_train_step

    manifest, feat_dir = dual_corpus
    vocab = Vocabulary(["a", "b"])
    entries = read_manifests(manifest, 16.7)
    batcher = DualSSLBucketBatcher(entries, vocab, batch_size=4, ssl_folder=feat_dir,
                                   train=True, bucket_seconds=(2.0,))
    (batch,) = list(batcher)

    model = DualStreamAsrModel(num_classes=3, mask=True)
    rng = jax.random.PRNGKey(0)
    w2v = jnp.asarray(batch.waves)
    mel_dummy = jnp.zeros((4, 100, 64))
    variables = model.init({"params": rng, "dropout": rng}, w2v, mel_dummy,
                           jnp.ones((4,)), False)
    opt = novograd(1e-3, betas=(0.8, 0.5))
    state = AsrTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        nan_count=jnp.zeros((), jnp.int32))

    step = jax.jit(make_dual_train_step(model, opt, blank_id=2,
                                        mel_frontend=DUAL_MEL_CONFIG))
    arrays = {"waves": batch.waves, "wave_lens": batch.wave_lens,
              "targets": batch.targets, "target_lens": batch.target_lens,
              **batch.extra}
    state, metrics = step(state, {k: jnp.asarray(v) for k, v in arrays.items()}, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
