"""Experiment loggers — TensorBoard + CSV/JSONL + Comet-compatible stub.

The reference fans out to CometLogger + TensorBoardLogger
(``/root/reference/exp_loggers.py:11-27``) configured from the ``loggers``
config section with interpolated experiment names
(``conf/conf.yaml:38-50``).  Same surface here: ``init_loggers(cfg)``
returns a ``MultiLogger``; Comet activates only when the SDK + api key are
present, otherwise it degrades to a warning (this image has no comet_ml).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Mapping, Optional

logger = logging.getLogger(__name__)


class BaseLogger:
    def log_metrics(self, metrics: Mapping[str, float], step: int) -> None:
        raise NotImplementedError

    def log_hyperparams(self, params: Mapping) -> None:
        pass

    def log_text(self, tag: str, text: str, step: int) -> None:
        pass

    def finalize(self) -> None:
        pass


class CSVLogger(BaseLogger):
    """JSONL metrics stream (one object per log call)."""

    def __init__(self, save_dir: str | Path, name: str = "metrics"):
        self.path = Path(save_dir) / f"{name}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a", encoding="utf-8")

    def log_metrics(self, metrics, step):
        row = {"step": int(step), "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def log_hyperparams(self, params):
        hp_path = self.path.with_name("hparams.json")
        hp_path.write_text(json.dumps(params, indent=2, default=str))

    def finalize(self):
        self._fh.close()


class TensorBoardLogger(BaseLogger):
    def __init__(self, save_dir: str | Path, name: str = "default"):
        self.save_dir = str(Path(save_dir) / name)
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(self.save_dir)
        except Exception:
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._writer = SummaryWriter(self.save_dir)
            except Exception:
                logger.warning("no tensorboard writer available; TensorBoardLogger disabled")
                self._writer = None

    def log_metrics(self, metrics, step):
        if self._writer is None:
            return
        for k, v in metrics.items():
            self._writer.add_scalar(k, float(v), int(step))

    def log_text(self, tag, text, step):
        if self._writer is not None:
            self._writer.add_text(tag, text, int(step))

    def log_hyperparams(self, params):
        if self._writer is not None:
            self._writer.add_text("hparams", json.dumps(params, indent=2, default=str), 0)

    def finalize(self):
        if self._writer is not None:
            self._writer.close()


class CometLogger(BaseLogger):
    """Comet-compatible logger; a no-op unless comet_ml + api key exist
    (mirrors ``exp_loggers.py:13-21``: api key, workspace, project, composed
    experiment name, resumable experiment_key)."""

    def __init__(self, api_key: Optional[str] = None, workspace: Optional[str] = None,
                 project_name: Optional[str] = None, experiment_name: Optional[str] = None,
                 experiment_key: Optional[str] = None):
        self._exp = None
        if not api_key:
            logger.info("CometLogger: no api key; disabled")
            return
        try:
            import comet_ml  # type: ignore

            if experiment_key:
                self._exp = comet_ml.ExistingExperiment(
                    api_key=api_key, previous_experiment=experiment_key)
            else:
                self._exp = comet_ml.Experiment(
                    api_key=api_key, workspace=workspace, project_name=project_name)
            if experiment_name:
                self._exp.set_name(experiment_name)
        except Exception as e:  # pragma: no cover
            logger.warning("CometLogger disabled: %s", e)

    def log_metrics(self, metrics, step):
        if self._exp is not None:
            self._exp.log_metrics({k: float(v) for k, v in metrics.items()}, step=int(step))

    def log_hyperparams(self, params):
        if self._exp is not None:
            self._exp.log_parameters(dict(params))

    def log_text(self, tag, text, step):
        if self._exp is not None:
            self._exp.log_text(f"[{tag}] {text}", step=int(step))

    def log_code(self, folder: str | Path) -> None:
        """Upload a source snapshot of ``folder`` to the experiment —
        ``exp_loggers.py:26`` parity (``log_code(folder='../../../../')``)."""
        if self._exp is not None:
            self._exp.log_code(folder=str(folder))

    def finalize(self):
        if self._exp is not None:
            self._exp.end()


class MultiLogger(BaseLogger):
    def __init__(self, loggers):
        self.loggers = [lg for lg in loggers if lg is not None]

    def log_metrics(self, metrics, step):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_hyperparams(self, params):
        for lg in self.loggers:
            lg.log_hyperparams(params)

    def log_text(self, tag, text, step):
        for lg in self.loggers:
            lg.log_text(tag, text, step)

    def finalize(self):
        for lg in self.loggers:
            lg.finalize()


_comet_logger: Optional[CometLogger] = None


def get_comet_experiment():
    """Global Comet experiment accessor (``exp_loggers.py:29-32`` parity);
    None when Comet is unavailable/disabled."""
    return _comet_logger._exp if _comet_logger is not None else None


def init_loggers(cfg, run_dir: str | Path = "outputs") -> MultiLogger:
    """Build the logger fan-out from the ``loggers`` config section."""
    global _comet_logger
    run_dir = Path(run_dir)
    loggers = [CSVLogger(run_dir)]
    tb_cfg = (cfg or {}).get("tensorboard", {}) if cfg else {}
    loggers.append(TensorBoardLogger(
        tb_cfg.get("save_dir") or run_dir / "tensorboard_log",
        tb_cfg.get("name", "default"),
    ))
    comet_cfg = (cfg or {}).get("comet", {}) if cfg else {}
    _comet_logger = CometLogger(
        api_key=comet_cfg.get("COMET_API_KEY"),
        workspace=comet_cfg.get("workspace"),
        project_name=comet_cfg.get("project_name"),
        experiment_name=comet_cfg.get("experiment_fixed_name"),
        experiment_key=comet_cfg.get("experiment_key"),
    )
    # Source snapshot per experiment (exp_loggers.py:26): upload the package
    # root rather than the reference's fragile '../../../../' relative hop.
    _comet_logger.log_code(Path(__file__).resolve().parents[2])
    loggers.append(_comet_logger)
    return MultiLogger(loggers)
