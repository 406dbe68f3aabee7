"""CLI entry wiring: train.py / train_ssl.py build the full object graph
(config -> datamodule -> model -> optimizer -> Trainer) without compiling —
catches config-key and constructor regressions cheaply."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

import importlib.util

_REPO = Path(__file__).resolve().parents[1]


def _load_cli(name: str):
    """Import a repo-root CLI module by explicit path (immune to the
    reference repo appearing on sys.path with same-named entry files)."""
    if name in sys.modules and getattr(sys.modules[name], "__file__", "").startswith(str(_REPO)):
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, _REPO / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


from lightning_asr_tpu.data.audio import write_wav


@pytest.fixture
def tiny_corpus(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        n = 8000
        path = tmp_path / f"u{i}.wav"
        write_wav(path, (rng.standard_normal(n) * 0.1).astype(np.float32)[None], 16000)
        rows.append({"audio_filepath": str(path), "duration": 0.5, "text": "ab"})
    manifest = tmp_path / "m.json"
    with open(manifest, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return manifest


def test_train_cli_wiring(tiny_corpus, tmp_path, monkeypatch):
    train_mod = _load_cli("train")

    captured = {}

    class FakeTrainer:
        def __init__(self, **kwargs):
            captured.update(kwargs)

        def fit(self, resume=None):
            captured["fit_called"] = True
            captured["resume"] = resume
            return "STATE"

        def test(self, state):
            captured["tested"] = state

    monkeypatch.setattr(train_mod, "Trainer", FakeTrainer)
    train_mod.main([
        f'data.train_manifest=["{tiny_corpus}"]',
        f"data.val_manifest={tiny_corpus}",
        f"data.test_manifest={tiny_corpus}",
        "train.total_epoch=2",
        "train.train_batch_size=2",
        "train.warmup_steps=1",
        f"run_dir={tmp_path}/run",
        "model.compute_dtype=f32",
    ])
    assert captured["fit_called"] and captured["tested"] == "STATE"
    assert captured["total_epochs"] == 2
    assert captured["datamodule"].vocab.blank_id == 28
    assert captured["hparams"]["encoder"] == "quartznet12_context"
    assert captured["lr_schedule"] is not None

    # plateau recipe wires inject_hyperparams + controller
    captured.clear()
    train_mod.main([
        f'data.train_manifest=["{tiny_corpus}"]',
        f"data.val_manifest={tiny_corpus}",
        f"data.test_manifest={tiny_corpus}",
        "train.scheduler=reduce_on_plateau",
        "train.total_epoch=1",
        f"run_dir={tmp_path}/run2",
    ])
    assert captured["plateau"] is not None
    assert hasattr(captured["optimizer"].init({"w": np.zeros(1)}), "hyperparams")


def test_train_ssl_cli_wiring(tiny_corpus, tmp_path, monkeypatch):
    import pickle

    ssl_mod = _load_cli("train_ssl")

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        with open(feat_dir / f"u{i}.pkl", "wb") as f:
            pickle.dump(rng.standard_normal((1, 25, 512)).astype(np.float32), f)

    captured = {}

    class FakeTrainer:
        def __init__(self, **kwargs):
            captured.update(kwargs)

        def fit(self, resume=None):
            captured["fit_called"] = True
            return "STATE"

        def test(self, state):
            captured["tested"] = state

    monkeypatch.setattr(ssl_mod, "SSLTrainer", FakeTrainer)
    ssl_mod.main([
        f'data.train_manifest=["{tiny_corpus}"]',
        f"data.val_manifest={tiny_corpus}",
        f"data.test_manifest={tiny_corpus}",
        f"ssl.feature_folder={feat_dir}",
        "train.total_epoch=1",
        "train.train_batch_size=2",
        "train.warmup_steps=1",
        f"run_dir={tmp_path}/ssl-run",
    ])
    assert captured["fit_called"]
    assert captured["pseudo_start_epoch"] == 300
    assert captured["model"].feature_in == 512


def test_train_ssl_retrain_cli_wiring(tiny_corpus, tmp_path, monkeypatch):
    ssl_mod = _load_cli("train_ssl")

    captured = {}

    class FakeTrainer:
        def __init__(self, **kwargs):
            captured.update(kwargs)

        def init_state(self):
            return "INIT"

        def fit(self, resume=None, initial_state=None):
            captured["fit_called"] = True
            captured["initial_state"] = initial_state
            return "STATE"

        def test(self, state):
            captured["tested"] = state

    import lightning_asr_tpu.training.retrain_trainer as rt

    monkeypatch.setattr(rt, "SSLRetrainTrainer", FakeTrainer)
    ssl_mod.main([
        f'data.train_manifest=["{tiny_corpus}"]',
        f"data.val_manifest={tiny_corpus}",
        f"data.test_manifest={tiny_corpus}",
        "ssl.retrain=true",
        "train.total_epoch=1",
        "train.train_batch_size=2",
        "train.warmup_steps=1",
        f"run_dir={tmp_path}/retrain-run",
    ])
    assert captured.get("fit_called")
    assert captured["model"].feat_extract_norm == "layer"
    assert captured["hparams"]["ssl_retrain"] is True


def test_server_cli_wiring(monkeypatch):
    """``python -m lightning_asr_tpu.inference.server`` parses flags and
    forwards them to serve() (README/MIGRATING advertise this entry)."""
    import lightning_asr_tpu.inference.server as srv

    captured = {}
    monkeypatch.setattr(srv, "serve", lambda model, **kw: captured.update(
        {"model": model, **kw}))
    monkeypatch.setattr(sys, "argv", [
        "server", "--model", "/tmp/ck", "--port", "5005", "--batching", "on",
        "--max-batch", "16", "--max-wait-ms", "5",
        "--warmup-seconds", "2.0", "5.0"])
    srv._main()
    assert captured == {"model": "/tmp/ck", "host": "0.0.0.0", "port": 5005,
                        "use_flask": None, "batching": "on", "max_batch": 16,
                        "max_wait_ms": 5.0, "warmup_seconds": [2.0, 5.0],
                        "max_queue": 64}
