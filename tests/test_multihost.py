"""Multi-host data parallelism: 2 real JAX processes, 8 global CPU devices.

The reference's ``num_nodes`` was a PL passthrough tested by PL itself
(``/root/reference/train.py:251``); here the multi-host path (per-process
manifest row-slices + ``jax.make_array_from_process_local_data`` stitching +
gloo collectives) is exercised end-to-end: both workers must see IDENTICAL
per-step losses (SPMD consistency) that match a single-process run of the
same global batches, and the cross-host-reduced val metrics must agree.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from lightning_asr_tpu.data.pipeline import BucketBatcher
from lightning_asr_tpu.data.vocab import Vocabulary

sys.path.insert(0, str(Path(__file__).parent))
from test_training_e2e import LABELS, corpus, make_trainer  # noqa: F401,E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_sharded_batcher_slices_match_global(tmp_path, corpus):  # noqa: F811
    """Concatenating the per-rank slices reproduces the single-host batches
    (same plan, same order, same shapes)."""
    from lightning_asr_tpu.data.manifest import read_manifests

    entries = read_manifests([str(corpus)], 16.7)
    vocab = Vocabulary.from_config(LABELS)
    mk = lambda **kw: BucketBatcher(entries, vocab, 8, train=True, crop=True,
                                    seed=3, bucket_seconds=(0.7,), **kw)
    full = list(mk())
    shards = [list(mk(shard_rank=r, shard_count=2, pad_to=8)) for r in range(2)]
    assert len(full) == len(shards[0]) == len(shards[1])
    for fb, s0, s1 in zip(full, *shards):
        assert s0.global_size == s1.global_size == 8
        assert s0.valid_size == s1.valid_size == 4
        waves = np.concatenate([s0.waves, s1.waves])
        np.testing.assert_array_equal(waves, fb.waves)
        np.testing.assert_array_equal(
            np.concatenate([s0.targets, s1.targets]), fb.targets)
        np.testing.assert_array_equal(
            np.concatenate([s0.wave_lens, s1.wave_lens]), fb.wave_lens)


def test_sharded_batcher_pads_tail_rows(tmp_path):
    """A global batch not divisible by the mesh gets wave_lens=160 pad rows
    and valid_size excludes them."""
    from lightning_asr_tpu.data.audio import write_wav
    from lightning_asr_tpu.data.manifest import ManifestEntry

    rng = np.random.default_rng(0)
    entries = []
    for i in range(5):  # 5 entries, batch 8, eval mode (no drop_last)
        path = tmp_path / f"u{i}.wav"
        write_wav(path, (rng.standard_normal(4800) * 0.1).astype(np.float32)[None], 16000)
        entries.append(ManifestEntry(str(path), 0.3, "cat"))
    vocab = Vocabulary.from_config(LABELS)
    # rank 1 owns global rows 4..7 -> 1 real row + 3 pad rows
    b = BucketBatcher(entries, vocab, 8, train=False, crop=False, seed=0,
                      bucket_seconds=(0.7,), shard_rank=1, shard_count=2, pad_to=8)
    batch = next(iter(b))
    assert batch.global_size == 8 and batch.valid_size == 1 and batch.size == 1
    assert batch.waves.shape[0] == 4
    assert (batch.wave_lens[1:] == 160).all()
    assert (batch.target_lens[1:] == 0).all()
    # rank 0 owns 4 real rows
    b0 = BucketBatcher(entries, vocab, 8, train=False, crop=False, seed=0,
                       bucket_seconds=(0.7,), shard_rank=0, shard_count=2, pad_to=8)
    batch0 = next(iter(b0))
    assert batch0.valid_size == 4 and (batch0.wave_lens == 4800).all()


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path, corpus):  # noqa: F811
    port = _free_port()
    worker = Path(__file__).parent / "multihost_worker.py"
    outs = [tmp_path / f"out{r}.json" for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), str(port), str(corpus), str(outs[r])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert results[0]["process_count"] == 2
    # SPMD consistency: identical losses on both ranks
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-5)
    assert np.isfinite(results[0]["losses"]).all()
    assert results[0]["val"].keys() == results[1]["val"].keys()
    for k in results[0]["val"]:
        np.testing.assert_allclose(results[0]["val"][k], results[1]["val"][k],
                                   rtol=1e-5, err_msg=k)

    # Cross-check against a single-process run over the same global batches.
    trainer = make_trainer(corpus, tmp_path, total_epochs=1)
    single_losses = []
    from lightning_asr_tpu.training.callbacks import Callback

    class Rec(Callback):
        def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
            single_losses.append(float(metrics["loss"]))

    trainer.callbacks.append(Rec())
    state = trainer.fit()
    np.testing.assert_allclose(results[0]["losses"], single_losses, rtol=1e-4)
    val = trainer.validate(state)
    np.testing.assert_allclose(results[0]["val"]["val_loss"], val["val_loss"], rtol=1e-4)
    np.testing.assert_allclose(results[0]["val"]["val_wer_corpus"],
                               val["val_wer_corpus"], atol=1e-6)


def test_two_process_tensor_parallel_training(tmp_path, corpus):  # noqa: F811
    """Multi-host x tp (VERDICT r3 #5b): 2 JAX processes x 4 local devices
    form a (data=4, model=2) mesh — dp rows sliced per process by the
    sharded batcher, the conv trunk channel-sharded over 'model' INSIDE each
    host.  SPMD consistency: identical losses on both ranks, finite, and
    each process's local devices hold half-width trunk shards."""
    port = _free_port()
    worker = Path(__file__).parent / "multihost_worker.py"
    outs = [tmp_path / f"tp_out{r}.json" for r in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), str(port), str(corpus),
             str(outs[r]), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    logs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"tp worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert results[0]["process_count"] == 2 and results[0]["tp"] == 2
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"], rtol=1e-5)
    assert np.isfinite(results[0]["losses"]).all()
    for r in results:
        assert r["shards"]["local"] == [r["shards"]["full"] // 2], r["shards"]
    for k in results[0]["val"]:
        np.testing.assert_allclose(results[0]["val"][k], results[1]["val"][k],
                                   rtol=1e-5, err_msg=k)
        assert np.isfinite(results[0]["val"][k])
