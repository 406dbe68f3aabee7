"""Checkpointing: orbax-backed, top-k by val_wer + last, resume, and
config-free loading for inference.

Reference behavior mirrored (``/root/reference/train.py:210-212,237``):
``ModelCheckpoint(monitor='val_wer', save_top_k=3, save_last=True,
filename='asr-{epoch:02d}-{val_wer:.2f}')`` and ``resume_from_checkpoint``;
hyperparameters ride inside the checkpoint (``save_hyperparameters``,
``train.py:194``) so ``load_from_checkpoint`` needs no config
(``predict.py:37``).
"""

from __future__ import annotations

import json
import math
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Multi-host note: call ``save``/``restore`` collectively from ALL
    processes with the SAME (shared-filesystem) directory — orbax writes from
    the primary host and barriers internally; host-side file management
    (rmtree, metadata.json, index.json) happens on process 0 only."""

    def __init__(self, directory: str | Path, top_k: int = 3, monitor: str = "val_wer"):
        self.directory = Path(directory).resolve()
        self._primary = jax.process_index() == 0
        if self._primary:
            self.directory.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self._ckpt = ocp.StandardCheckpointer()
        self._index_path = self.directory / "index.json"
        self._index = self._load_index()

    def _load_index(self) -> dict:
        if self._index_path.exists():
            return json.loads(self._index_path.read_text())
        return {"saved": [], "last": None}

    def _write_index(self) -> None:
        self._index_path.write_text(json.dumps(self._index, indent=2))

    def _save_tree(self, path: Path, state: Any, metadata: dict) -> None:
        if self._primary and path.exists():
            shutil.rmtree(path)
        # collective on multi-host: orbax writes from the primary and
        # synchronizes processes internally
        self._ckpt.save(path / "state", state)
        self._ckpt.wait_until_finished()
        if self._primary:
            (path / "metadata.json").write_text(json.dumps(metadata, indent=2, default=str))

    def save(self, state: Any, epoch: int, metrics: dict, hparams: Optional[dict] = None,
             trainer_meta: Optional[dict] = None) -> None:
        """Save 'last' always; keep the top-k best by the monitored metric.

        ``trainer_meta`` carries host-side controller state that lives outside
        the jax pytree (e.g. the ReduceLROnPlateau best/patience counters —
        the reference delegates this to Lightning, which checkpoints
        ``lr_schedulers`` state dicts alongside the weights,
        ``/root/reference/train.py:210-212``)."""
        state = jax.device_get(state)
        metadata = {"epoch": epoch, "metrics": {k: float(v) for k, v in metrics.items()},
                    "hparams": hparams or {}}
        if trainer_meta:
            metadata["trainer"] = trainer_meta

        self._save_tree(self.directory / "last", state, metadata)
        self._index["last"] = "last"

        score = metrics.get(self.monitor)
        if score is not None and math.isfinite(float(score)):
            name = f"asr-epoch{epoch:02d}-{self.monitor}{float(score):.2f}"
            self._save_tree(self.directory / name, state, metadata)
            self._index["saved"].append({"name": name, "score": float(score), "epoch": epoch})
            self._index["saved"].sort(key=lambda e: e["score"])
            while len(self._index["saved"]) > self.top_k:
                worst = self._index["saved"].pop()
                worst_path = self.directory / worst["name"]
                if self._primary and worst_path.exists():
                    shutil.rmtree(worst_path)
        if self._primary:
            self._write_index()

    @property
    def best(self) -> Optional[str]:
        if self._index["saved"]:
            return str(self.directory / self._index["saved"][0]["name"])
        return None

    @property
    def last(self) -> Optional[str]:
        p = self.directory / "last"
        return str(p) if p.exists() else None

    def restore(self, target_state: Any, which: str = "last") -> tuple[Any, dict]:
        """Restore into the structure of `target_state` (abstract template).

        Falls back to an exact NovoGrad fused<->per-tensor optimizer-state
        migration when the template's opt-state VARIANT differs from the
        saved one — the topology-change workflow: dp checkpoints default to
        the fused variant, tensor-parallel runs require per-tensor
        (``optim.novograd.migrate_novograd_opt_state``)."""
        path = Path(which)
        if not path.is_absolute():
            path = self.directory / which
        try:
            return load_checkpoint(path, target_state)
        except Exception as template_err:
            try:
                raw, meta = load_checkpoint(path, None)
                state = _rebuild_with_opt_migration(raw, target_state)
            except Exception:
                raise template_err
            import logging

            logging.getLogger(__name__).warning(
                "restored %s with a NovoGrad fused<->per-tensor opt-state "
                "migration (optimizer variant changed, e.g. dp -> tp)", path)
            return state, meta


def _rebuild_with_opt_migration(raw: dict, target_state: Any) -> Any:
    """Rebuild a train state from a template-free orbax restore, migrating
    the NovoGrad optimizer state across the fused/per-tensor boundary."""
    import jax.numpy as jnp

    from ..optim.novograd import migrate_novograd_opt_state

    def cast_like(template, value):
        return jax.tree.map(lambda t, v: jnp.asarray(v, t.dtype), template, value)

    opt_state = migrate_novograd_opt_state(
        raw["opt_state"], raw["params"], target_state.opt_state)
    return target_state.replace(
        step=jnp.asarray(raw["step"], jnp.int32),
        params=cast_like(target_state.params, raw["params"]),
        batch_stats=cast_like(target_state.batch_stats, raw["batch_stats"]),
        opt_state=opt_state,
        nan_count=jnp.asarray(raw["nan_count"], jnp.int32),
    )


def load_checkpoint(path: str | Path, target_state: Any = None) -> tuple[Any, dict]:
    """Load (state, metadata) from a checkpoint directory.

    With ``target_state`` the restore matches its tree structure/dtypes
    (robust); without it, orbax restores the raw saved pytree.
    """
    path = Path(path).resolve()
    ckpt = ocp.StandardCheckpointer()
    if target_state is not None:
        template = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(target_state))
        state = ckpt.restore(path / "state", template)
    else:
        state = ckpt.restore(path / "state")
    meta_path = path / "metadata.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, metadata
