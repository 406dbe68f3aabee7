"""End-to-end training integration on the virtual 8-device CPU mesh:
synthetic WAV corpus -> manifests -> datamodule -> Trainer.fit (2 epochs) ->
validate/test -> checkpoint save/restore.  This is the multi-chip sharding
test the reference never had (SURVEY §4)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lightning_asr_tpu.data import AsrDataModule
from lightning_asr_tpu.data.audio import write_wav
from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.ops.frontend import MelFrontendConfig
from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
from lightning_asr_tpu.training import Trainer
from lightning_asr_tpu.training.checkpoint import load_checkpoint

LABELS = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """16 tiny synthetic utterances + train/dev manifests."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    words = ["cat", "dog", "bird", "fish"]
    entries = []
    for i in range(16):
        dur = rng.uniform(0.3, 0.6)
        n = int(16000 * dur)
        wave = (rng.standard_normal(n) * 0.1).astype(np.float32)
        path = root / f"utt{i}.wav"
        write_wav(path, wave[None, :], 16000)
        text = " ".join(rng.choice(words, size=rng.integers(1, 3)))
        entries.append({"audio_filepath": str(path), "duration": n / 16000.0, "text": text})
    manifest = root / "manifest.json"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return manifest


def make_trainer(corpus, tmp_path, total_epochs=2, **trainer_kw):
    dm = AsrDataModule(
        train_manifest=str(corpus), dev_manifest=str(corpus), test_manifest=str(corpus),
        labels=LABELS, train_bs=8, dev_bs=8,
        bucket_seconds=(0.7,),  # one bucket: everything pads to 0.7s
    )
    model = build_model(num_classes=len(LABELS) + 1, mask=True, drop_rate=0.0)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100, cycle_mult=2, max_lr=1e-3, min_lr=1e-5,
        warmup_steps=5, gamma=0.5)
    opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    return Trainer(
        model, opt, dm, total_epochs=total_epochs, run_dir=tmp_path / "run",
        lr_schedule=schedule, log_every_n_steps=1, train_wer_every_n_steps=1,
        frontend=MelFrontendConfig(),
        hparams={"labels": LABELS, "encoder": "quartznet12_context"},
        **trainer_kw,
    )


def test_fit_validate_checkpoint(corpus, tmp_path):
    assert len(jax.devices()) == 8, "virtual 8-device mesh not active"
    trainer = make_trainer(corpus, tmp_path)
    state = trainer.fit()
    assert int(state.step) == 4  # 16 utts / bs 8 = 2 steps/epoch x 2 epochs
    assert int(state.nan_count) == 0
    assert np.isfinite(float(jax.tree.leaves(state.params)[0].sum()))

    val = trainer.validate(state)
    assert np.isfinite(val["val_loss"])
    assert 0 <= val["val_wer"] <= 2.0 or np.isfinite(val["val_wer"])

    test = trainer.test(state)
    assert np.isfinite(test["test_loss"])

    # checkpoints: last + top-k exist, restore round-trips
    ckpt_dir = tmp_path / "run" / "checkpoints"
    assert (ckpt_dir / "last").exists()
    index = json.loads((ckpt_dir / "index.json").read_text())
    assert index["saved"], "no top-k checkpoint written"

    restored, meta = load_checkpoint(ckpt_dir / "last", state)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    assert meta["epoch"] == 1
    assert meta["hparams"]["encoder"] == "quartznet12_context"


def test_resume_continues(corpus, tmp_path):
    trainer = make_trainer(corpus, tmp_path, total_epochs=1)
    trainer.fit()
    trainer2 = make_trainer(corpus, tmp_path, total_epochs=2)
    state = trainer2.fit(resume="last")
    assert int(state.step) == 4  # epoch 0 (2 steps) + resumed epoch 1 (2 steps)


def test_chunked_resume_matches_monolithic(corpus, tmp_path):
    """The chunked-resume discipline (scripts/convergence_loop.sh) must be a
    no-op numerically: stopping after epoch 0 via should_stop and resuming
    from 'last' must reproduce the monolithic 2-epoch run bit-for-bit.
    Holds because data order is epoch-seeded (trainer.py:296,311), the
    augment RNG folds in state.step (steps.py), and the checkpoint restores
    optimizer state + step exactly."""
    mono = make_trainer(corpus, tmp_path / "mono", total_epochs=2)
    mono_state = mono.fit()

    chunk1 = make_trainer(corpus, tmp_path / "chunk", total_epochs=2)

    from lightning_asr_tpu.training.callbacks import Callback

    class StopAfterFirstEpoch(Callback):
        def on_train_epoch_end(self, trainer, state, epoch):
            trainer.should_stop = True

    chunk1.callbacks.append(StopAfterFirstEpoch())
    chunk1.fit()

    chunk2 = make_trainer(corpus, tmp_path / "chunk", total_epochs=2)
    resumed_state = chunk2.fit(resume="last")

    assert int(resumed_state.step) == int(mono_state.step) == 4
    for a, b in zip(jax.tree.leaves(mono_state.params),
                    jax.tree.leaves(resumed_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(mono_state.opt_state),
                    jax.tree.leaves(resumed_state.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loss_decreases_single_batch(corpus, tmp_path):
    """Overfit-ability smoke: loss on a repeated batch should drop."""
    trainer = make_trainer(corpus, tmp_path, total_epochs=1)
    state = trainer.init_state()
    batcher = trainer.dm.train_dataloader(0)
    batch = next(iter(batcher))
    dev_batch = trainer._device_batch(batch)
    losses = []
    for _ in range(12):
        dev_batch = trainer._device_batch(batch)
        state, metrics = trainer._train_step(state, dev_batch, trainer.rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_device_cache_epochs(corpus, tmp_path):
    """device_cache=True: epoch 0 stages batches to HBM; later epochs replay
    the same device arrays (no host decode/transfer) in reshuffled order."""
    dm = AsrDataModule(
        train_manifest=str(corpus), dev_manifest=str(corpus),
        labels=LABELS, train_bs=8, dev_bs=8, bucket_seconds=(0.7,))
    model = build_model(num_classes=len(LABELS) + 1, mask=True)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100, cycle_mult=2, max_lr=1e-3, min_lr=1e-5,
        warmup_steps=5, gamma=0.5)
    opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    trainer = Trainer(
        model, opt, dm, total_epochs=3, run_dir=tmp_path / "run_devcache",
        lr_schedule=schedule, device_cache=True,
        check_val_every_n_epoch=10, log_every_n_steps=10**9,
        sample_log_every_n_batches=10**9)

    calls = {"n": 0}
    orig = dm.train_dataloader

    def counting(epoch=0):
        calls["n"] += 1
        return orig(epoch)

    dm.train_dataloader = counting
    state = trainer.fit()
    assert calls["n"] == 1  # the dataloader was built for epoch 0 only
    assert trainer._epoch_cache is not None and len(trainer._epoch_cache) == 2
    assert int(state.step) == 6  # 2 steps/epoch x 3 epochs all ran
    assert int(state.nan_count) == 0
    # replay must reshuffle: epoch stats show the same batch count
    assert all(s["batches"] == 2 for s in trainer.epoch_stats)
    # the exact-recipe crop path (VERDICT r3 #6): staged batches are
    # UNCROPPED (host crop off) and the step re-rolls the reference crop
    # in-graph every replay
    assert trainer._crop_in_graph is True
    assert dm.crop is False


def test_resolve_batch_limit_semantics():
    """Lightning limit_{train,val}_batches semantics
    (/root/reference/train.py:245-246, pinned 1.0 = everything)."""
    from lightning_asr_tpu.training.trainer import _resolve_batch_limit

    class FakeLoader:
        def __len__(self):
            return 10

    b = FakeLoader()
    assert _resolve_batch_limit(1.0, b) is None
    assert _resolve_batch_limit(None, b) is None
    assert _resolve_batch_limit(0.5, b) == 5
    assert _resolve_batch_limit(0.01, b) == 1  # fraction floors at 1 batch
    assert _resolve_batch_limit(0.0, b) == 0
    assert _resolve_batch_limit(3, b) == 3
    assert _resolve_batch_limit(0, b) == 0


def test_limit_train_and_val_batches(corpus, tmp_path):
    """limit_train_batches=1 truncates every epoch to one step (the prefetch
    worker must terminate, not block); limit_val_batches caps validation."""
    trainer = make_trainer(corpus, tmp_path, total_epochs=2,
                           limit_train_batches=1, limit_val_batches=1)
    state = trainer.fit()
    # 16 utts / bs 8 = 2 batches/epoch, capped to 1 x 2 epochs
    assert int(state.step) == 2
    assert all(s["batches"] == 1 for s in trainer.epoch_stats)
    val = trainer.validate(state)
    assert np.isfinite(val["val_loss"])
