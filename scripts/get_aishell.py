#!/usr/bin/env python
"""AISHELL-1 download -> manifests + frequency-sorted character vocab.

Behavioral equivalent of ``/root/reference/scripts/get_aishell.py``: fetch
the OpenSLR 33 archive, extract the nested per-speaker tarballs, build a
transcript map with intra-line spaces stripped (Mandarin characters only),
emit train/dev/test JSONL manifests, and write ``vocab.txt`` with characters
sorted by corpus frequency.
"""

from __future__ import annotations

import argparse
import json
import tarfile
import urllib.request
from collections import Counter
from pathlib import Path

URL = "https://www.openslr.org/resources/33/data_aishell.tgz"


def download_and_extract(root: Path) -> Path:
    tar_path = root / "data_aishell.tgz"
    if not tar_path.exists():
        print("downloading AISHELL-1 (15 GB)...")
        urllib.request.urlretrieve(URL, tar_path)
    data_dir = root / "data_aishell"
    if not data_dir.exists():
        print("extracting...")
        with tarfile.open(tar_path) as tf:
            tf.extractall(root)
    wav_dir = data_dir / "wav"
    marker = root / ".extracted_inner"
    if not marker.exists():
        for inner in sorted(wav_dir.glob("*.tar.gz")):
            print(f"extracting {inner.name}...")
            with tarfile.open(inner) as tf:
                tf.extractall(wav_dir)
        marker.touch()
    return data_dir


def load_transcripts(data_dir: Path) -> dict[str, str]:
    trans_path = data_dir / "transcript" / "aishell_transcript_v0.8.txt"
    transcripts = {}
    for line in trans_path.read_text(encoding="utf-8").splitlines():
        utt_id, _, text = line.partition(" ")
        transcripts[utt_id.strip()] = text.replace(" ", "").strip()
    return transcripts


def build_manifests(root: Path, data_dir: Path, transcripts: dict[str, str]) -> None:
    from lightning_asr_tpu.data.audio import duration_seconds

    counter: Counter = Counter()
    for split in ("train", "dev", "test"):
        rows = []
        missing = 0
        for wav_path in sorted((data_dir / "wav").rglob(f"{split}/*/*.wav")):
            utt_id = wav_path.stem
            text = transcripts.get(utt_id)
            if text is None:
                missing += 1
                continue
            rows.append({
                "audio_filepath": str(wav_path),
                "duration": round(duration_seconds(wav_path), 3),
                "text": text,
            })
            if split == "train":
                counter.update(text)
        manifest = root / f"aishell-{split}.json"
        with open(manifest, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row, ensure_ascii=False) + "\n")
        print(f"wrote {manifest} ({len(rows)} rows, {missing} without transcript)")

    vocab_path = root / "vocab.txt"
    with open(vocab_path, "w", encoding="utf-8") as f:
        for ch, _ in counter.most_common():
            f.write(ch + "\n")
    print(f"wrote {vocab_path} ({len(counter)} characters, frequency-sorted)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    args = ap.parse_args()
    root = Path(args.data_root)
    root.mkdir(parents=True, exist_ok=True)
    data_dir = download_and_extract(root)
    build_manifests(root, data_dir, load_transcripts(data_dir))


if __name__ == "__main__":
    main()
