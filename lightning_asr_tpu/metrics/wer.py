"""WER/CER metric with distributed-sum semantics.

Mirrors the reference metric (``/root/reference/utils/asr_metrics.py``):
  * ``word_error_rate(hyps, refs, use_cer)`` — corpus error rate =
    sum(edit distances) / sum(ref lengths), word- or char-tokenized;
  * ``WER`` accumulates (scores, words) numerator/denominator states that
    sum across data-parallel workers (the torchmetrics ``dist_reduce_fx=
    'sum'`` analog: here the counts are plain numbers reduced via psum'd
    device scalars or host addition by the Trainer);
  * greedy CTC decode lives in ``decoding.greedy`` (device-side collapse);
    this module works on already-decoded strings.

Note: the reference's ``update`` *assigns* instead of accumulating
(``asr_metrics.py:222-223``) so its ``compute()`` reflects only the last
batch — an upstream bug.  Here ``update`` accumulates correctly (and the
per-batch rate the reference logs is available as the return value).

The Levenshtein kernel is a small O(len_a * len_b) DP (the reference used
the C `editdistance` package); a C++ extension can be slotted behind
``editdistance_eval`` transparently.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

try:  # optional native kernel (built from native/editdistance)
    from lightning_asr_tpu.native import editdistance_eval as _native_editdistance
except Exception:  # pragma: no cover
    _native_editdistance = None


def _levenshtein(a: Sequence, b: Sequence) -> int:
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def editdistance_eval(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    if _native_editdistance is not None:
        return _native_editdistance(list(a), list(b))
    return _levenshtein(a, b)


def _tokenize(text: str, use_cer: bool) -> List[str]:
    return list(text) if use_cer else text.split()


def word_error_rate(hypotheses: List[str], references: List[str], use_cer: bool = False) -> float:
    """Corpus-level WER/CER over paired hypothesis/reference lists."""
    if len(hypotheses) != len(references):
        raise ValueError(
            "hypotheses and references must have the same number of elements, "
            f"got {len(hypotheses)} and {len(references)}"
        )
    scores = 0
    words = 0
    for h, r in zip(hypotheses, references):
        h_toks, r_toks = _tokenize(h, use_cer), _tokenize(r, use_cer)
        words += len(r_toks)
        scores += editdistance_eval(h_toks, r_toks)
    return 1.0 * scores / words if words != 0 else float("inf")


class WER:
    """Accumulating WER/CER metric.

    ``update`` returns the *batch* error rate (what the reference logs per
    step); ``compute`` returns the accumulated corpus rate.  ``merge_counts``
    lets the Trainer sum (scores, words) across data-parallel hosts.
    """

    def __init__(self, vocabulary: Sequence[str], use_cer: bool = False):
        self.vocabulary = list(vocabulary)
        self.blank_id = len(self.vocabulary)
        self.labels_map = {i: c for i, c in enumerate(self.vocabulary)}
        self.use_cer = use_cer
        self.reset()

    def reset(self) -> None:
        self.scores = 0
        self.words = 0

    def decode_ids(self, ids: Sequence[int]) -> str:
        return "".join(self.labels_map[int(i)] for i in ids)

    def decode_reference(self, targets, target_lengths) -> List[str]:
        """(B, L) padded label ids + lengths -> reference strings."""
        out = []
        import numpy as np

        targets = np.asarray(targets)
        target_lengths = np.asarray(target_lengths)
        for row, n in zip(targets, target_lengths):
            out.append(self.decode_ids(row[: int(n)]))
        return out

    def update(self, hypotheses: List[str], references: List[str]) -> float:
        scores = 0
        words = 0
        for h, r in zip(hypotheses, references):
            h_toks, r_toks = _tokenize(h, self.use_cer), _tokenize(r, self.use_cer)
            words += len(r_toks)
            scores += editdistance_eval(h_toks, r_toks)
        self.scores += scores
        self.words += words
        return 1.0 * scores / words if words else float("inf")

    def merge_counts(self, scores: int, words: int) -> None:
        self.scores += scores
        self.words += words

    def compute(self) -> float:
        return 1.0 * self.scores / self.words if self.words else float("inf")
