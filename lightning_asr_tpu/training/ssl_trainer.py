"""SSL training with pseudo-labeling — the reference's ``SSLLightingModule``
loop (``/root/reference/train_ssl.py``):

  * model: ``feature_mapping`` Linear 512->64 + QuartNet12-context with
    ``in_c=64`` (:42, :315-316) — our ``AsrModel(feature_in=512)``;
  * train-time augmentation: features_cutout instead of SpecAugment
    (``ssl_data_module.py:317-318``), no per-utterance normalization;
  * **pseudo-labeling** at epoch end (:223-260): gated on
    ``epoch >= pseudo_start_epoch (300) and epoch % pseudo_every (7) == 0``;
    greedy-decode the unlabeled pool, score confidence, keep utterances
    with score <= 0.01, inject as extra training data and rebuild the train
    loader (the confidence math is vectorized — no thread pool needed).
"""

from __future__ import annotations

import logging

import numpy as np

from ..data.pipeline import prefetch
from ..decoding.greedy import greedy_decode_to_strings
from ..ssl_codec.confidence import confidence_scores
from .trainer import Trainer

logger = logging.getLogger(__name__)


class SSLTrainer(Trainer):
    def __init__(
        self,
        *args,
        pseudo_start_epoch: int = 300,
        pseudo_every_n_epochs: int = 7,
        pseudo_confidence_threshold: float = 0.01,
        pseudo_confidence_measure: str = "ref",
        **kwargs,
    ):
        kwargs.setdefault("from_features", True)
        kwargs.setdefault("augment", "cutout")
        kwargs.setdefault("normalize", False)
        super().__init__(*args, **kwargs)
        self.pseudo_start_epoch = pseudo_start_epoch
        self.pseudo_every_n_epochs = pseudo_every_n_epochs
        self.pseudo_confidence_threshold = pseudo_confidence_threshold
        self.pseudo_confidence_measure = pseudo_confidence_measure

    def on_train_epoch_end(self, state, epoch) -> None:
        if epoch < self.pseudo_start_epoch or epoch % self.pseudo_every_n_epochs != 0:
            return
        if not getattr(self.dm, "unlabeled_entries", None):
            return
        logger.info("pseudo-labeling pass at epoch %d", epoch)
        self._pseudo_pass(state)

    def on_resume(self, state, start_epoch) -> None:
        """Chunked-resume parity: the injected pseudo set lives in the
        datamodule, not the checkpoint, so a fresh process resuming past
        ``pseudo_start_epoch`` would train labeled-only until the next
        scheduled pass.  Re-run the pass once at resume so the train set
        matches what the monolithic run would be using at this epoch (the
        decode uses the restored weights — the same model the last
        scheduled pass before the stop would have used, one pass later)."""
        every = self.pseudo_every_n_epochs
        fired = any(e % every == 0
                    for e in range(self.pseudo_start_epoch, start_epoch))
        if not fired:
            return
        if not getattr(self.dm, "unlabeled_entries", None):
            return
        logger.info("pseudo-labeling refresh on resume at epoch %d", start_epoch)
        self._pseudo_pass(state)

    def _pseudo_pass(self, state) -> None:
        kept = []
        total = 0
        for batch in prefetch(iter(self.dm.pseudo_train_dataloader()), self.dm.prefetch_depth):
            out = self._eval_step(state, self._device_batch(batch))
            n = batch.size
            texts = greedy_decode_to_strings(
                out["preds"], out["pred_lens"], self.vocab.labels, self.vocab.blank_id
            )[:n]
            conf = confidence_scores(
                np.asarray(out["log_probs"])[:n],
                np.asarray(out["pred_lens"])[:n],
                self.vocab.blank_id, self.pseudo_confidence_measure)
            for path, text, c in zip(batch.paths, texts, conf):
                total += 1
                if c <= self.pseudo_confidence_threshold and text.strip():
                    kept.append((path, text))
        logger.info("pseudo-labeling: kept %d / %d (%.1f%%)",
                    len(kept), total, 100.0 * len(kept) / max(total, 1))
        self.loggers.log_metrics(
            {"pseudo_kept": len(kept), "pseudo_total": total}, int(state.step))
        if kept:
            # carry durations from the unlabeled manifest — offline-feature
            # corpora have no wav on disk for inject's duration fallback to
            # probe (and probing would be wasted host IO regardless)
            durs = {e.audio_filepath: e.duration
                    for e in self.dm.unlabeled_entries}
            self.dm.inject_pseudo_datasets(
                [(p, t, durs[p]) if p in durs else (p, t) for p, t in kept])
