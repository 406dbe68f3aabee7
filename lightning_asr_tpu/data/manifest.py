"""JSONL manifest reading with duration filtering.

Manifest rows are ``{"audio_filepath": ..., "duration": ..., "text": ...}``
exactly as the reference's prep scripts emit (``scripts/get_libri.py:135``)
and its dataset consumes with a ``duration > max_duration`` filter
(``/root/reference/data_module.py:25-35``; defaults train 16.7s / dev 40s
from ``conf/conf.yaml:15-16``).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import List, Sequence, Union

logger = logging.getLogger(__name__)


@dataclass
class ManifestEntry:
    audio_filepath: str
    duration: float
    text: str


def read_manifests(
    manifest_paths: Union[str, Path, Sequence[Union[str, Path]]],
    max_duration: float = 16.7,
) -> List[ManifestEntry]:
    """Read one or more JSONL manifests, dropping rows over ``max_duration``."""
    if isinstance(manifest_paths, (str, Path)):
        manifest_paths = [manifest_paths]
    entries: List[ManifestEntry] = []
    for path in manifest_paths:
        filtered_count = 0
        filtered_duration = 0.0
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if row["duration"] > max_duration:
                    filtered_count += 1
                    filtered_duration += row["duration"]
                    continue
                entries.append(
                    ManifestEntry(row["audio_filepath"], float(row["duration"]), row["text"])
                )
        logger.info(
            "manifest %s: filtered %d utterances (%.2f min) over %.1fs",
            path, filtered_count, filtered_duration / 60.0, max_duration,
        )
    return entries


def write_manifest(path: Union[str, Path], entries: Sequence[ManifestEntry]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(
                json.dumps(
                    {"audio_filepath": e.audio_filepath, "duration": e.duration, "text": e.text},
                    ensure_ascii=False,
                )
                + "\n"
            )
