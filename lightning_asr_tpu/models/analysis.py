"""Model analysis: parameter counts and FLOPs — the reference's ptflops
MACs/params report (``models/QuartNet.py:324-346``), via XLA's own cost
model instead of a torch-graph walker."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def param_breakdown(params, depth: int = 1) -> dict:
    """Parameter counts grouped by the top `depth` name components."""
    out: dict = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path[:depth])
        out[key] = out.get(key, 0) + leaf.size
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def flops_estimate(model, feature_shape=(1, 1024, 64), train: bool = False) -> Optional[float]:
    """Forward-pass FLOPs from XLA's cost analysis (None if unavailable)."""
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(feature_shape, jnp.float32)
    percents = jnp.ones((feature_shape[0],), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, percents, False)

    lowered = jax.jit(lambda v, x, p: model.apply(v, x, p, False)).lower(variables, x, percents)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def summarize(model, feature_shape=(1, 1024, 64)) -> str:
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros(feature_shape, jnp.float32)
    percents = jnp.ones((feature_shape[0],), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, percents, False)
    n = count_params(variables["params"])
    lines = [f"params: {n / 1e6:.2f} M"]
    flops = flops_estimate(model, feature_shape)
    if flops:
        lines.append(f"forward flops @ {feature_shape}: {flops / 1e9:.2f} G")
    for k, v in param_breakdown(variables["params"], depth=2).items():
        lines.append(f"  {k:<40} {v / 1e6:8.3f} M")
    return "\n".join(lines)


if __name__ == "__main__":
    from .quartznet import build_model

    print(summarize(build_model(num_classes=29, mask=True)))
