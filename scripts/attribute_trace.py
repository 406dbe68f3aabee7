#!/usr/bin/env python
"""Join an xplane device trace with the dumped HLO's op_name metadata to
attribute step time to model components (depthwise fwd/wgrad/dgrad,
pointwise, BN, LSTM, CTC, frontend, optimizer...).

Usage: python scripts/attribute_trace.py /tmp/step_hlo.txt /tmp/jax_trace_step
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

HLO_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+) = .*?metadata=\{op_name=\"([^\"]*)\"")


def classify(op_name: str, hlo_name: str) -> str:
    transpose = "transpose(" in op_name  # backward pass
    o = op_name
    if "depthwise_conv" in o:
        kind = "depthwise"
    elif "pointwise_conv" in o or "reside_conv" in o or "last_conv" in o or "decoder" in o:
        kind = "pointwise/1x1"
    elif "/bn/" in o or "reside_bn" in o or "last_bn" in o or "head_bn" in o:
        kind = "batchnorm"
    elif "context_rnn" in o or "head_rnn" in o:
        kind = "lstm"
    elif "ctc" in o.lower():
        kind = "ctc"
    elif "log_mel" in o or "frontend" in o or "stft" in o or "mel" in o:
        kind = "frontend"
    elif "novograd" in o or "update" in o.lower() or "opt" in o.lower():
        kind = "optimizer"
    else:
        kind = "other"
    return kind + (" BWD" if transpose else "")


def main():
    hlo_path, trace_dir = sys.argv[1], sys.argv[2]
    name2op = {}
    for line in open(hlo_path):
        m = HLO_RE.match(line)
        if m:
            name2op[m.group(1)] = m.group(2)

    from jax.profiler import ProfileData

    paths = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    data = ProfileData.from_serialized_xspace(paths[-1].read_bytes())
    by_class = collections.Counter()
    by_op = collections.Counter()
    steps = 0
    unattributed = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "Steps":
                steps = max(steps, len(list(line.events)))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                nm = ev.name.lstrip("%").split(" = ")[0]
                op = name2op.get(nm)
                if op is None:
                    unattributed[nm.rstrip("0123456789.")] += ev.duration_ns
                    by_class["UNATTRIBUTED"] += ev.duration_ns
                    continue
                cls = classify(op, nm)
                by_class[cls] += ev.duration_ns
                # short op: last 3 path segments
                segs = op.split("/")
                by_op[(cls, "/".join(segs[-4:-1]))] += ev.duration_ns
        break

    steps = steps or 1
    total = sum(by_class.values())
    print(f"steps traced: {steps}; total XLA-op time {total/1e6/steps:.3f} ms/step\n")
    print("== by class (ms/step) ==")
    for c, t in by_class.most_common():
        print(f"  {t/1e6/steps:8.3f}  {c}")
    print("\n== top (class, op) (ms/step) ==")
    for (c, o), t in by_op.most_common(35):
        print(f"  {t/1e6/steps:8.3f}  {c:18s} {o}")
    print("\n== top unattributed hlo ops (ms/step) ==")
    for n, t in unattributed.most_common(15):
        print(f"  {t/1e6/steps:8.3f}  {n}")


if __name__ == "__main__":
    main()
