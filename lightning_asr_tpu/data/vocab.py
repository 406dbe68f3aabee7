"""Label/vocabulary handling.

Mirrors the reference semantics:
  * labels come either inline from config (English: 28 chars incl. space and
    apostrophe, ``/root/reference/conf/conf.yaml:12-13``) or from a text file
    with one character per line (Mandarin vocab files), in which case CER mode
    is auto-enabled (``/root/reference/train.py:216-219``).
  * the CTC blank is the **last** index: ``blank_id == len(labels)``
    (``/root/reference/train.py:196``, ``utils/asr_metrics.py:108``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterable, List, Sequence, Union


def load_labels(labels: Union[str, Path, Sequence[str]]) -> tuple[list[str], bool]:
    """Return (labels, use_cer). A string/path is read one label per line and
    flips CER mode, matching the reference's train entry."""
    if isinstance(labels, (str, Path)):
        with open(labels, encoding="utf-8") as f:
            items = [line.strip() for line in f.readlines()]
        return [c for c in items if c != ""], True
    return list(labels), False


@dataclass
class Vocabulary:
    labels: List[str]
    use_cer: bool = False
    char2index: dict = field(init=False, repr=False)
    index2char: dict = field(init=False, repr=False)

    def __post_init__(self):
        self.char2index = {c: i for i, c in enumerate(self.labels)}
        self.index2char = {i: c for i, c in enumerate(self.labels)}

    @classmethod
    def from_config(cls, labels: Union[str, Path, Sequence[str]]) -> "Vocabulary":
        items, use_cer = load_labels(labels)
        return cls(items, use_cer)

    @property
    def blank_id(self) -> int:
        return len(self.labels)  # blank is the LAST index

    @property
    def vocab_size(self) -> int:
        return len(self.labels)

    @property
    def num_classes(self) -> int:
        """Model output width = vocab + blank."""
        return len(self.labels) + 1

    def encode(self, text: str) -> list[int]:
        return [self.char2index[c] for c in text]

    def decode(self, ids: Iterable[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i >= len(self.labels):
                raise IndexError(f"label id {i} out of range (vocab={len(self.labels)})")
            out.append(self.index2char[i])
        return "".join(out)

    def __len__(self) -> int:
        return len(self.labels)
