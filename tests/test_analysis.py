"""Model analysis utility (the reference's ptflops MACs/params role)."""

import jax

from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.models.analysis import count_params, param_breakdown, summarize


def test_param_count_and_breakdown():
    model = build_model(num_classes=29, mask=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jax.numpy.zeros((1, 64, 64)), jax.numpy.ones((1,)), False)
    n = count_params(variables["params"])
    assert 5e6 < n < 20e6
    breakdown = param_breakdown(variables["params"], depth=2)
    assert sum(breakdown.values()) == n
    assert any("decoder" in k for k in breakdown)


def test_summarize_runs():
    model = build_model(num_classes=29, mask=True)
    text = summarize(model, feature_shape=(1, 128, 64))
    assert "params:" in text and "M" in text
