"""Loggers + simple profiler behavior."""

import json
import time

from lightning_asr_tpu.training.loggers import (
    CSVLogger, MultiLogger, get_comet_experiment, init_loggers)
from lightning_asr_tpu.training.profiler import SimpleProfiler


def test_csv_logger_roundtrip(tmp_path):
    lg = CSVLogger(tmp_path)
    lg.log_metrics({"loss": 1.5, "wer": 0.2}, step=3)
    lg.log_hyperparams({"lr": 1e-2})
    lg.finalize()
    rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["loss"] == 1.5 and rows[0]["step"] == 3
    assert json.loads((tmp_path / "hparams.json").read_text())["lr"] == 1e-2


def test_init_loggers_and_comet_accessor(tmp_path):
    ml = init_loggers({"comet": {"COMET_API_KEY": None},
                       "tensorboard": {"save_dir": str(tmp_path / "tb")}},
                      run_dir=tmp_path)
    assert isinstance(ml, MultiLogger) and len(ml.loggers) >= 2
    # no api key / no sdk -> accessor returns None (reference parity surface)
    assert get_comet_experiment() is None
    ml.log_metrics({"x": 1.0}, 0)
    ml.log_text("tag", "hello", 0)
    ml.finalize()


def test_simple_profiler_report():
    prof = SimpleProfiler()
    with prof.profile("step"):
        time.sleep(0.01)
    with prof.profile("step"):
        time.sleep(0.01)
    with prof.profile("eval"):
        time.sleep(0.005)
    report = prof.summary()
    assert "Profiler Report" in report and "step" in report and "eval" in report
    assert "TOTAL ELAPSED" in report
