"""Templated run directories + logging config group.

The reference nests every run under
``outputs/${model_name}/${date}/${time}-${experiment_name}`` with a
hydra-managed python logging profile
(``/root/reference/conf/log/hypra_logger.yaml:2-41``, selected via the
``defaults:`` list in ``conf/conf.yaml:2-3``).  These tests pin the same
behavior in our config machinery: the ``${now:...}`` resolver, the
``conf/log/`` group wiring, distinct dirs for consecutive runs, and the
job-logging file handler landing inside the run dir.
"""

import logging
import re
import time
from pathlib import Path

from lightning_asr_tpu.utils import load_config, setup_run_dir
from lightning_asr_tpu.utils.config import Config, _resolve_interpolations

CONF = Path(__file__).resolve().parents[1] / "conf" / "conf.yaml"


def test_now_resolver_formats_timestamp():
    cfg = Config({"d": "${now:%Y-%m-%d}", "t": "x-${now:%H-%M-%S}-y"})
    _resolve_interpolations(cfg)
    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", cfg.d)
    assert re.fullmatch(r"x-\d{2}-\d{2}-\d{2}-y", cfg.t)


def test_log_group_loaded_and_run_dir_templated():
    cfg = load_config(CONF)
    run_dir = cfg.get("log.run.dir")
    # outputs/asr12x1/<date>/<time>-<experiment name>
    assert re.fullmatch(
        r"outputs/asr12x1/\d{4}-\d{2}-\d{2}/\d{2}-\d{2}-\d{2}-asr12x1-lr.+-bs32",
        run_dir), run_dir
    assert cfg.get("log.job_logging.format").startswith("[%(asctime)s]")


def test_consecutive_runs_get_distinct_dirs():
    a = load_config(CONF).get("log.run.dir")
    time.sleep(1.05)  # template resolution is second-granular
    b = load_config(CONF).get("log.run.dir")
    assert a != b


def test_setup_run_dir_creates_dir_and_log_file(tmp_path):
    cfg = Config({
        "log": {
            "run": {"dir": str(tmp_path / "outputs" / "m" / "d" / "t-x")},
            "job_logging": {"format": "[%(levelname)s] %(message)s",
                            "level": "INFO", "filename": "train.log"},
        }
    })
    run_dir = setup_run_dir(cfg)
    assert run_dir.is_dir()
    pkg = logging.getLogger("lightning_asr_tpu")
    try:
        pkg.info("hello run dir")
        for h in pkg.handlers:
            if hasattr(h, "flush"):
                h.flush()
        text = (run_dir / "train.log").read_text()
        assert "hello run dir" in text
        assert text.startswith("[INFO]")
    finally:  # detach the file handler so later tests don't write here
        for h in list(pkg.handlers):
            if isinstance(h, logging.FileHandler):
                pkg.removeHandler(h)
                h.close()


def test_setup_run_dir_falls_back_to_flat_run_dir(tmp_path):
    cfg = Config({"run_dir": str(tmp_path / "flat")})
    assert setup_run_dir(cfg) == tmp_path / "flat"
    assert (tmp_path / "flat").is_dir()
