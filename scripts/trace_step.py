#!/usr/bin/env python
"""Capture a device trace of the train step and print a per-op cost table.

Parses the xplane protobuf via jax.profiler.ProfileData (no tensorboard
dependency), aggregates XLA op durations by fusion name, and prints the
top-K ops — the "usable per-op trace on the tunneled backend" VERDICT #5
asked for.
"""

from __future__ import annotations

import collections
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import novograd
    from lightning_asr_tpu.training.steps import create_train_state, make_train_step

    B, SECONDS = 32, 16.7
    S = int(SECONDS * 16000)
    rng = jax.random.PRNGKey(0)
    rng_np = np.random.default_rng(0)

    waves = jnp.asarray((rng_np.standard_normal((B, S)) * 0.1).astype(np.float32))
    batch = {
        "waves": waves,
        "wave_lens": jnp.full((B,), S, jnp.int32),
        "prev_samples": jnp.zeros((B,)),
        "targets": jnp.asarray(rng_np.integers(0, 28, size=(B, 224)).astype(np.int32)),
        "target_lens": jnp.full((B,), 224, jnp.int32),
    }
    cfg = MelFrontendConfig(precision="default")
    model = build_model(num_classes=29, mask=True, dtype=jnp.bfloat16)
    opt = novograd(1e-3, betas=(0.8, 0.5), weight_decay=1e-3)
    state = create_train_state(model, opt, rng)
    step = jax.jit(make_train_step(model, opt, 28, cfg, augment=True), donate_argnums=(0,))

    state, m = step(state, batch, rng)
    float(m["loss"])
    state, m = step(state, batch, rng)
    float(m["loss"])

    trace_dir = "/tmp/jax_trace_step"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            state, m = step(state, batch, rng)
        float(m["loss"])

    # locate xplane files
    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    print(f"xplane files: {[str(p) for p in paths]}")
    if not paths:
        print("NO TRACE PRODUCED")
        return

    from jax.profiler import ProfileData

    def category(name: str) -> str:
        n = name.lstrip("%")
        for pre in ("convolution", "fusion", "copy", "slice", "dynamic-slice",
                    "custom-call", "reduce", "transpose", "all-reduce", "scatter",
                    "bitcast", "dot", "select", "broadcast", "concatenate", "add",
                    "multiply", "while", "dynamic-update-slice", "rng", "iota",
                    "constant", "reverse", "pad", "convert", "compare"):
            if n.startswith(pre) or n.startswith(pre.replace("-", "_")):
                return pre
        head = n.split(" = ")[0].rstrip("0123456789.").rstrip("-_")
        return head[:40]

    for p in paths:
        data = ProfileData.from_serialized_xspace(p.read_bytes())
        for plane in data.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            print(f"\n##### plane: {plane.name}")
            for line in plane.lines:
                events = list(line.events)
                if not events:
                    continue
                tot = sum(ev.duration_ns for ev in events) / 1e6
                print(f"\n=== line: {line.name!r} ({len(events)} events, sum {tot:.3f} ms) ===")
                if tot < 1.0:
                    continue
                by_cat = collections.Counter()
                by_name = collections.Counter()
                cnt_name = collections.Counter()
                for ev in events:
                    by_cat[category(ev.name)] += ev.duration_ns
                    key = ev.name.split(" = ")[0]
                    by_name[key] += ev.duration_ns
                    cnt_name[key] += 1
                print(" -- by category:")
                for c, t in by_cat.most_common(20):
                    print(f"  {t/1e6:9.3f} ms  {c}")
                print(" -- top ops:")
                for nm, t in by_name.most_common(30):
                    print(f"  {t/1e6:9.3f} ms  x{cnt_name[nm]:<4d} {nm[:100]}")


if __name__ == "__main__":
    main()
