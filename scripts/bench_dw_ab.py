#!/usr/bin/env python
"""A/B the hybrid depthwise-wgrad Pallas kernel inside the FULL fused train
step (the only measurement that matters: scripts/bench_depthwise.py showed
isolated conv dispatches hit a ~1.1 ms tunnel/dispatch floor, 5x the
in-step per-op cost, so op-level microbenches cannot resolve this).

Times the B=32 x 16.7 s headline step with LASR_DW_WGRAD_PALLAS off vs on
in one process (fresh jit per arm — the toggle is read at trace time).
Writes DW_AB.json with step ms and the implied headline delta; the winner
becomes the default in ops/depthwise_pallas.py.

Usage: python scripts/bench_dw_ab.py [--out DW_AB.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DW_AB.json")
    ap.add_argument("--seconds", type=float, default=16.7)
    ap.add_argument("--B", type=int, default=32)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.depthwise_pallas import (
        set_depthwise_wgrad_pallas)
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import (cosine_annealing_warmup_restarts,
                                         novograd)
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    model = build_model(num_classes=29, encoder="quartznet12_context",
                        mask=True, dtype=jnp.bfloat16)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100000, cycle_mult=2, max_lr=1e-2, min_lr=1e-4,
        warmup_steps=1000, gamma=0.5)
    optimizer = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3)
    frontend = MelFrontendConfig(precision="default")

    arms = {}
    for name, on in (("xla_wgrad", False), ("pallas_wgrad", True)):
        set_depthwise_wgrad_pallas(on)
        try:
            rate = bench.bench_bucket(model, optimizer, frontend,
                                      args.seconds, B=args.B)
        finally:
            set_depthwise_wgrad_pallas(False)
        arms[name] = {
            "audio_sec_per_sec": round(rate, 1),
            "step_ms": round(args.B * args.seconds / rate * 1000, 3),
        }
        print(name, arms[name], flush=True)

    delta = arms["xla_wgrad"]["step_ms"] - arms["pallas_wgrad"]["step_ms"]
    report = {
        "config": {"B": args.B, "seconds": args.seconds},
        "arms": arms,
        "pallas_wins": delta > 0,
        "delta_ms_per_step": round(delta, 3),
        "speedup": round(arms["pallas_wgrad"]["audio_sec_per_sec"]
                         / arms["xla_wgrad"]["audio_sec_per_sec"], 4),
    }
    Path(Path(__file__).resolve().parents[1] / args.out).write_text(
        json.dumps(report, indent=2) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
