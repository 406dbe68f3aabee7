"""Config system (hydra-style surface), audio IO, manifest, vocab."""

import io
import json

import numpy as np
import pytest

from lightning_asr_tpu.data.audio import read_audio, read_wav, write_wav
from lightning_asr_tpu.data.manifest import ManifestEntry, read_manifests, write_manifest
from lightning_asr_tpu.data.vocab import Vocabulary
from lightning_asr_tpu.utils import load_config, parse_overrides


def test_config_overrides_and_interpolation(tmp_path):
    (tmp_path / "conf.yaml").write_text(
        "model_name: asr\n"
        "defaults:\n  - log: base\n"
        "train:\n  lr: 1e-2\n  bs: 32\n"
        "name: '${model_name}-lr${train.lr}'\n"
    )
    (tmp_path / "log").mkdir()
    (tmp_path / "log" / "base.yaml").write_text("level: INFO\n")

    cfg = load_config(tmp_path / "conf.yaml", overrides=["train.lr=5e-3", "train.new.deep=7"])
    assert cfg.train.lr == 5e-3          # yaml-typed override
    assert cfg.train.new.deep == 7       # nested creation
    assert cfg.log.level == "INFO"       # defaults group
    assert cfg.name == "asr-lr0.005"     # interpolation after override
    assert cfg.get("train.bs") == 32     # dotted get
    assert cfg.get("no.such.key", "d") == "d"


def test_parse_overrides_types():
    ov = dict(parse_overrides(["a=null", "b=[1,2]", "c=true", "d=x y"]))
    assert ov["a"] is None and ov["b"] == [1, 2] and ov["c"] is True and ov["d"] == "x y"
    with pytest.raises(ValueError):
        parse_overrides(["noequals"])


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    wave = np.clip(rng.standard_normal(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    path = tmp_path / "t.wav"
    write_wav(path, wave[None], 16000)
    out, sr = read_wav(path)
    assert sr == 16000 and out.shape == (1, 1000)
    np.testing.assert_allclose(out[0], wave, atol=1.0 / 32768)

    # BytesIO + bytes input
    data = path.read_bytes()
    out2, _ = read_audio(io.BytesIO(data), mono=True)
    np.testing.assert_array_equal(out, out2)


def test_wav_stereo_mono(tmp_path):
    wave = np.stack([np.ones(100, np.float32) * 0.5, -np.ones(100, np.float32) * 0.5])
    path = tmp_path / "st.wav"
    write_wav(path, wave, 8000)
    out, sr = read_audio(path, mono=True)
    assert out.shape == (1, 100)
    assert abs(out.mean()) < 1e-4  # L/R cancel


def test_manifest_roundtrip_and_filter(tmp_path):
    entries = [ManifestEntry(f"/a/{i}.wav", float(i), f"text {i}") for i in range(5)]
    path = tmp_path / "m.json"
    write_manifest(path, entries)
    out = read_manifests(path, max_duration=2.5)
    assert [e.duration for e in out] == [0.0, 1.0, 2.0]


def test_vocab_from_file_flips_cer(tmp_path):
    path = tmp_path / "vocab.txt"
    path.write_text("你\n好\n")
    v = Vocabulary.from_config(str(path))
    assert v.use_cer and v.labels == ["你", "好"]
    assert v.blank_id == 2 and v.num_classes == 3
    assert v.encode("好你") == [1, 0] and v.decode([0, 1]) == "你好"
    with pytest.raises(IndexError):
        v.decode([5])


def test_vocab_inline_labels():
    v = Vocabulary.from_config([" ", "a", "b"])
    assert not v.use_cer and v.blank_id == 3
