#!/usr/bin/env python
"""Prep for the v5 converged-teacher SSL A/B (scripts/ssl_converged_driver.sh).

1. Regenerates the v4 quantity-regime corpus in a fresh root with the SAME
   seeds — clean train/pool/dev splits are byte-identical to v4's; the
   corrupt pool is regenerated through the ADVICE-r4 amplitude fix (per-
   utterance std sqrt(2^2 + scale^2), matching the clean pool instead of
   sitting quieter).
2. Seeds BOTH arm run dirs with the v4 control's epoch-479 'last'
   checkpoint — the converged teacher (dev CER 0.187) and the shared
   branch point at the step-9600 cycle boundary.

Run via the driver; standalone: python scripts/prepare_ssl_v5.py --root ...
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ssl_smoke import make_corpus  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--v4_root", default="/tmp/sslv4ab_n12b")
    ap.add_argument("--utts", type=int, default=320)
    ap.add_argument("--pool_clean", type=int, default=2560)
    ap.add_argument("--pool_corrupt", type=int, default=320)
    ap.add_argument("--base_noise", type=float, default=1.2)
    args = ap.parse_args()

    root = Path(args.root)
    v4 = Path(args.v4_root)
    src_ckpt = v4 / "run_False" / "checkpoints" / "last"
    if not src_ckpt.exists():
        sys.exit(f"v4 control checkpoint not found: {src_ckpt}")

    if (root / "dev_manifest.json").exists():
        print("corpus already present, skipping regeneration")
    else:
        root.mkdir(parents=True, exist_ok=True)
        from ssl_smoke import LABELS

        rng = np.random.default_rng(0)
        # identical to ssl_smoke.py main(): patterns from seed 0, std 2.0
        patterns = rng.standard_normal((len(LABELS), 512)).astype(np.float32) * 2.0
        noise = (args.base_noise, args.base_noise)
        make_corpus(root, args.utts, 1, "train", patterns, noise=noise)
        make_corpus(root, args.pool_clean, 2, "pseudo", patterns, noise=noise)
        make_corpus(root, args.pool_corrupt, 4, "corrupt", None, noise=noise)
        make_corpus(root, max(args.utts // 3, 16), 3, "dev", patterns, noise=noise)
        print("corpus regenerated (corrupt pool amplitude-matched)")

    for arm in ("run_True", "run_False"):
        dst = root / arm / "checkpoints" / "last"
        if dst.exists():
            print(f"{arm}: branch checkpoint already seeded")
            continue
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src_ckpt, dst)
        print(f"{arm}: seeded from {src_ckpt}")


if __name__ == "__main__":
    main()
