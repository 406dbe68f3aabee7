#!/usr/bin/env python
"""Microbench the depthwise convs of QuartNet12-context in isolation, split
fwd vs wgrad per layer shape, against analytic VPU/HBM bounds.

ROOFLINE.json attributes 10.7 ms/step to the depthwise class vs a 6.4 ms
VPU-compute bound (59.7%).  The class bucket mixes fwd, dgrad and wgrad
(dgrad of a stride-1 same-pad depthwise IS a depthwise conv with reversed
taps, so fwd time ~= dgrad time); this script finds WHICH op is far from
its bound so an optimization (e.g. a single-pass VMEM-resident Pallas
wgrad) targets the real offender instead of re-fighting XLA's strong
depthwise emitter (see ops/sepconv_pallas.py's failed fused attempt).

Timing uses chained data dependencies + a final host fetch (the tunneled
backend's block_until_ready is unreliable — CLAUDE.md).

Usage: python scripts/bench_depthwise.py [--out DEPTHWISE_BENCH.json]
Reference shapes: /root/reference/models/QuartNetContext.py:125-184 at
B=32, 16.7 s (T=832 post-stride frames).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 32
VPU_TFLOPS = 7.7e12
HBM_GBS = 819e9

# (name, C, T, k, count_in_model) — stem runs pre-stride at T=1664 on 64ch
CONFIGS = [
    ("stem_c64_T1664_k33", 64, 1664, 33, 1),
    ("c256_k33", 256, 832, 33, 3),
    ("c256_k39", 256, 832, 39, 3),
    ("c336_k51", 336, 832, 51, 1),
    ("c512_k51", 512, 832, 51, 2),
    ("c512_k63", 512, 832, 63, 3),
    ("c512_k75", 512, 832, 75, 1),
    ("c512_k87", 512, 832, 87, 1),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DEPTHWISE_BENCH.json")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU: logic check only")
    args = ap.parse_args()
    if args.smoke:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        CONFIGS[:] = [("smoke", 8, 64, 5, 1)]
        args.steps = 2

    import jax
    import jax.numpy as jnp
    from jax import lax

    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()

    def dwconv(x, w):
        k = w.shape[0]
        return lax.conv_general_dilated(
            x, w[:, None, :], window_strides=(1,), padding=((k // 2, k // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=x.shape[-1])

    def time_chained(fn, *init, n=args.steps, windows=3):
        """fn(carry, *rest) -> carry (same shape): chain to serialize."""
        carry, rest = init[0], init[1:]
        out = fn(carry, *rest)  # compile + warm
        _ = float(jnp.sum(out[(0,) * out.ndim]) if out.ndim else jnp.sum(out))
        best = float("inf")
        for _ in range(windows):
            c = carry
            t0 = time.perf_counter()
            for _ in range(n):
                c = fn(c, *rest)
            _ = float(c.reshape(-1)[0])  # host fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best / n * 1e3  # ms

    results = {}
    total = {"fwd_ms": 0.0, "wgrad_ms": 0.0, "fwd_bound_ms": 0.0,
             "wgrad_bound_ms": 0.0}
    for name, C, T, k, count in CONFIGS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, C)) * 0.1, jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)

        fwd = jax.jit(lambda x, w: dwconv(x, w))
        # wgrad isolated: dw = grad_w sum(conv(x, w) * dy); chain via x so
        # successive steps depend on the previous result
        def wgrad_step(x, w, dy):
            dw = jax.grad(lambda w: jnp.sum(dwconv(x, w) * dy))(w)
            return x + jnp.mean(dw).astype(x.dtype)  # tiny dep, keeps shape
        wgrad = jax.jit(wgrad_step)

        fwd_ms = time_chained(fwd, x, w)
        wgrad_ms = time_chained(wgrad, x, w, dy)

        flops = 2.0 * B * T * C * k
        fwd_bytes = (2 * B * T * C) * 2 + 2 * k * C       # x read + y write
        wg_bytes = (2 * B * T * C) * 2 + 4 * k * C        # x + dy read
        fwd_bound = max(flops / VPU_TFLOPS, fwd_bytes / HBM_GBS) * 1e3
        wg_bound = max(flops / VPU_TFLOPS, wg_bytes / HBM_GBS) * 1e3
        results[name] = {
            "C": C, "T": T, "k": k, "count": count,
            "fwd_ms": round(fwd_ms, 4), "fwd_bound_ms": round(fwd_bound, 4),
            "fwd_pct_of_bound": round(100 * fwd_bound / fwd_ms, 1),
            "wgrad_ms": round(wgrad_ms, 4),
            "wgrad_bound_ms": round(wg_bound, 4),
            "wgrad_pct_of_bound": round(100 * wg_bound / wgrad_ms, 1),
        }
        total["fwd_ms"] += count * fwd_ms
        total["wgrad_ms"] += count * wgrad_ms
        total["fwd_bound_ms"] += count * fwd_bound
        total["wgrad_bound_ms"] += count * wg_bound
        print(name, results[name], flush=True)

    report = {
        "device": str(jax.devices()[0]),
        "batch": B,
        "per_shape": results,
        # model totals: fwd + dgrad (~= fwd) + wgrad
        "model_totals_ms": {
            "fwd": round(total["fwd_ms"], 3),
            "dgrad_approx": round(total["fwd_ms"], 3),
            "wgrad": round(total["wgrad_ms"], 3),
            "sum": round(2 * total["fwd_ms"] + total["wgrad_ms"], 3),
            "sum_bound": round(2 * total["fwd_bound_ms"]
                               + total["wgrad_bound_ms"], 3),
        },
        "roofline_class_measured_ms": 10.707,
    }
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report["model_totals_ms"]))


if __name__ == "__main__":
    main()
