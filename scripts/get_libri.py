#!/usr/bin/env python
"""LibriSpeech download -> wav -> JSONL manifest.

Behavioral equivalent of the reference prep script
(``/root/reference/scripts/get_libri.py``): fetch the OpenSLR tarballs,
extract, walk ``*.trans.txt`` transcripts, transcode flac -> 16 kHz mono
16-bit wav, and emit one JSONL manifest per subset with rows
``{"audio_filepath", "duration", "text"}``.  ``--data_sets BASE`` =
dev-clean + train-clean-100; ``ALL`` = all seven subsets.

Offline host tooling: transcoding shells out to ffmpeg/sox/flac (whichever
exists), parallelized over worker processes.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import shutil
import subprocess
import tarfile
import urllib.request
from pathlib import Path

URLS = {
    "dev-clean": "https://www.openslr.org/resources/12/dev-clean.tar.gz",
    "dev-other": "https://www.openslr.org/resources/12/dev-other.tar.gz",
    "test-clean": "https://www.openslr.org/resources/12/test-clean.tar.gz",
    "test-other": "https://www.openslr.org/resources/12/test-other.tar.gz",
    "train-clean-100": "https://www.openslr.org/resources/12/train-clean-100.tar.gz",
    "train-clean-360": "https://www.openslr.org/resources/12/train-clean-360.tar.gz",
    "train-other-500": "https://www.openslr.org/resources/12/train-other-500.tar.gz",
}
BASE = ["dev-clean", "train-clean-100"]
ALL = list(URLS)


def _transcoder() -> list[str] | None:
    if shutil.which("ffmpeg"):
        return ["ffmpeg", "-nostdin", "-y", "-loglevel", "error", "-i", "{src}",
                "-ar", "16000", "-ac", "1", "-sample_fmt", "s16", "{dst}"]
    if shutil.which("sox"):
        return ["sox", "{src}", "-r", "16000", "-c", "1", "-b", "16", "{dst}"]
    if shutil.which("flac"):
        return ["flac", "-s", "-f", "-d", "{src}", "-o", "{dst}"]
    return None


def download(subset: str, root: Path) -> Path:
    tar_path = root / f"{subset}.tar.gz"
    if not tar_path.exists():
        print(f"downloading {subset}...")
        urllib.request.urlretrieve(URLS[subset], tar_path)
    marker = root / f".extracted_{subset}"
    if not marker.exists():
        print(f"extracting {subset}...")
        with tarfile.open(tar_path) as tf:
            tf.extractall(root)
        marker.touch()
    return root / "LibriSpeech" / subset


def _convert_one(args) -> dict | None:
    flac_path, text, cmd_template = args
    wav_path = Path(flac_path).with_suffix(".wav")
    if not wav_path.exists():
        cmd = [c.format(src=str(flac_path), dst=str(wav_path)) for c in cmd_template]
        try:
            subprocess.run(cmd, check=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"transcode failed for {flac_path}: {e}")
            return None
    from lightning_asr_tpu.data.audio import duration_seconds

    return {
        "audio_filepath": str(wav_path),
        "duration": round(duration_seconds(wav_path), 3),
        "text": text,
    }


def build_manifest(subset_dir: Path, manifest_path: Path, num_workers: int) -> None:
    cmd_template = _transcoder()
    if cmd_template is None:
        raise RuntimeError("no flac transcoder found (need ffmpeg, sox, or flac)")
    jobs = []
    for trans_file in sorted(subset_dir.rglob("*.trans.txt")):
        for line in trans_file.read_text().splitlines():
            utt_id, _, text = line.partition(" ")
            flac_path = trans_file.parent / f"{utt_id}.flac"
            if flac_path.exists():
                jobs.append((flac_path, text.strip().lower(), cmd_template))
    print(f"{subset_dir.name}: {len(jobs)} utterances")
    with mp.Pool(num_workers) as pool:
        rows = [r for r in pool.map(_convert_one, jobs) if r is not None]
    with open(manifest_path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {manifest_path} ({len(rows)} rows)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--data_sets", default="BASE", help="BASE | ALL | comma-separated subsets")
    ap.add_argument("--num_workers", type=int, default=4)
    args = ap.parse_args()

    root = Path(args.data_root)
    root.mkdir(parents=True, exist_ok=True)
    if args.data_sets == "BASE":
        subsets = BASE
    elif args.data_sets == "ALL":
        subsets = ALL
    else:
        subsets = args.data_sets.split(",")

    for subset in subsets:
        subset_dir = download(subset, root)
        build_manifest(subset_dir, root / f"{subset}.json", args.num_workers)


if __name__ == "__main__":
    main()
