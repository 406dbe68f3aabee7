"""LM-fused CTC beam search — the reference's ``BeamSearchDecoderWithLM``
API (``/root/reference/beam_search.py:17-59``): construct with vocabulary +
beam width + alpha/beta + optional ARPA LM path, call ``forward(log_probs,
lengths)`` with (B, T, V+1) numpy log-probs to get the best hypothesis text
per sample.  Defaults match the reference's usage: beam 40, alpha=beta=1.0,
cutoff_prob 0.99, cutoff_top_n 40 (``predict.py:217-223``,
``beam_search.py:40-46``).

The engine is the native C++ prefix beam search + from-scratch ARPA n-gram
scorer (``native/ctc_decoder/ctc_beam_search.cpp``) over a thread pool —
the KenLM + SWIG `ctc_decoders` role.  Unlike the reference there is no
probs/log-probs round trip (`revert_softmax`): the C++ side consumes
log-probs directly.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ..native import get_lib

logger = logging.getLogger(__name__)


class BeamSearchDecoderWithLM:
    def __init__(
        self,
        vocab: Sequence[str],
        beam_width: int = 40,
        alpha: float = 1.0,
        beta: float = 1.0,
        lm_path: Optional[str] = None,
        num_cpus: int = 4,
        cutoff_prob: float = 0.99,
        cutoff_top_n: int = 40,
        hotwords: Optional[dict] = None,
    ):
        """``hotwords`` maps word -> additive log-score boost (contextual
        biasing, beyond the reference): partial trie matches earn
        boost/len(word) per char and are retracted on mismatch; a completed
        word locks in exactly its boost.  Words are tokenized greedily by
        longest-matching vocab symbol (multi-byte symbols supported)."""
        self.vocab = list(vocab)
        self.num_cpus = max(1, num_cpus)
        self._lib = get_lib()
        self._lm = None
        if lm_path:
            if not Path(lm_path).exists():
                raise FileNotFoundError(f"LM not found: {lm_path}")
            self._lm = self._lib.lasr_lm_load(str(lm_path).encode())
            if not self._lm:
                raise ValueError(f"failed to parse ARPA LM: {lm_path}")
            logger.info("loaded %d-gram ARPA LM from %s",
                        self._lib.lasr_lm_order(self._lm), lm_path)

        c_vocab = (ctypes.c_char_p * len(self.vocab))(
            *[v.encode("utf-8") for v in self.vocab])
        self._decoder = self._lib.lasr_decoder_create(
            c_vocab, len(self.vocab), beam_width, alpha, beta,
            cutoff_prob, cutoff_top_n, self._lm)
        for word, boost in (hotwords or {}).items():
            self.add_hotword(word, float(boost))

    def _tokenize(self, word: str) -> List[int]:
        """Greedy longest-match split of ``word`` into vocab symbol ids."""
        by_len = sorted({len(v) for v in self.vocab if v}, reverse=True)
        sym = {v: i for i, v in enumerate(self.vocab)}
        ids: List[int] = []
        pos = 0
        while pos < len(word):
            for n in by_len:
                cand = word[pos : pos + n]
                if cand in sym:
                    ids.append(sym[cand])
                    pos += n
                    break
            else:
                raise ValueError(
                    f"hotword {word!r}: no vocab symbol matches at {pos} ({word[pos:]!r})")
        return ids

    def add_hotword(self, word: str, boost: float) -> None:
        """Register a hot word with an additive log-score ``boost``."""
        if not hasattr(self._lib, "lasr_decoder_add_hotword"):
            raise RuntimeError("native library predates hotword support — "
                               "delete native/build/ to rebuild")
        ids = self._tokenize(word)
        space_ids = {i for i, v in enumerate(self.vocab) if v and v.isspace()}
        if any(i in space_ids for i in ids):
            # The C++ decoder is word-level: a space resets the hotword trie
            # before advance, so a multi-word phrase earns partial boosts and
            # then silently retracts them — it can never complete.
            raise ValueError(
                f"hotword {word!r} contains a space symbol; the word-level "
                "decoder matches single words only — register each word "
                "separately")
        arr = (ctypes.c_int * len(ids))(*ids)
        self._lib.lasr_decoder_add_hotword(self._decoder, arr, len(ids),
                                           ctypes.c_float(boost))

    def forward(self, log_probs: np.ndarray, log_probs_length) -> List[str]:
        """(B, T, V+1) log-softmax outputs + per-sample lengths -> texts."""
        log_probs = np.ascontiguousarray(np.asarray(log_probs), np.float32)
        lengths = np.ascontiguousarray(np.asarray(log_probs_length), np.int32)
        B, T, C = log_probs.shape
        if C != len(self.vocab) + 1:
            raise ValueError(f"class dim {C} != vocab+1 ({len(self.vocab) + 1})")
        out_ids = np.zeros((B, T), np.int32)
        out_lens = np.zeros(B, np.int32)
        self._lib.lasr_decode_batch(
            self._decoder,
            log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            B, T, C, self.num_cpus,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return [
            "".join(self.vocab[i] for i in out_ids[b, : out_lens[b]])
            for b in range(B)
        ]

    __call__ = forward

    def __del__(self):  # pragma: no cover
        try:
            if getattr(self, "_decoder", None):
                self._lib.lasr_decoder_free(self._decoder)
            if getattr(self, "_lm", None):
                self._lib.lasr_lm_free(self._lm)
        except Exception:
            pass
