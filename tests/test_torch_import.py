"""Full-model numerical parity against the reference's own torch model.

The reference implementation at /root/reference is imported (read-only) as a
test oracle: its randomly-initialized ``MyModel2`` weights are converted
with ``utils.torch_import`` into our flax model, and the two models must
produce matching log-probs on the same input — covering SepConv stacks,
masked BatchNorm, residual blocks, the packed BiLSTM context branch, the
decoder and log-softmax, with non-trivial `percents` masking.
"""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lightning_asr_tpu.models import build_model
from lightning_asr_tpu.utils.torch_import import convert_state_dict, pad_to_match


def _convert_for(model, ref):
    """Convert + zero-pad to the model's (TPU-aligned) shapes."""
    import jax

    params, stats = convert_state_dict(ref.state_dict())
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, model.in_c if not model.feature_in else model.feature_in)),
                          jnp.ones((1,)), False)
    params = pad_to_match(params, template["params"])
    stats = pad_to_match(stats, template.get("batch_stats", {}))
    return params, stats

# append (not insert) so the reference's top-level train.py / train_ssl.py
# never shadow this repo's CLI modules for other tests
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

ref_models = pytest.importorskip("models.QuartNetContext")

LABELS = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]


@pytest.mark.parametrize("mask", [True, False])
def test_full_model_parity_with_reference(mask):
    torch.manual_seed(0)
    ref = ref_models.MyModel2(LABELS, drop_rate=0.0, mask=mask)
    ref.eval()

    model = build_model(num_classes=len(LABELS) + 1, mask=mask, drop_rate=0.0)
    params, stats = _convert_for(model, ref)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.default_rng(0)
    B, F, T = 2, 64, 128
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    percents = np.array([1.0, 0.7], np.float32)

    with torch.no_grad():
        golden = ref(torch.from_numpy(x[:, None]), torch.from_numpy(percents)).numpy()

    ours, out_lens = model.apply(
        variables, jnp.asarray(np.moveaxis(x, 1, 2)), jnp.asarray(percents), False
    )
    ours = np.asarray(ours)

    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_se_variant_parity_with_reference():
    """The squeeze-excite variant (QuartNetContextSE) must also round-trip."""
    import models.QuartNetContextSE as ref_se

    torch.manual_seed(2)
    ref = ref_se.MyModel2(LABELS, drop_rate=0.0, mask=True)
    ref.eval()

    model = build_model(num_classes=len(LABELS) + 1,
                        encoder="quartznet12_context_se", mask=True)
    params, stats = _convert_for(model, ref)
    rng = np.random.default_rng(3)
    B, F, T = 2, 64, 96
    x = rng.standard_normal((B, F, T)).astype(np.float32)
    percents = np.array([1.0, 0.5], np.float32)

    with torch.no_grad():
        golden = ref(torch.from_numpy(x[:, None]), torch.from_numpy(percents)).numpy()
    ours = np.asarray(model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.moveaxis(x, 1, 2)), jnp.asarray(percents), False)[0])
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_parameter_cover():
    """Every torch parameter tensor must land somewhere in the flax tree
    (no silently dropped weights)."""
    torch.manual_seed(1)
    ref = ref_models.MyModel2(LABELS, drop_rate=0.0, mask=True)
    params, stats = convert_state_dict(ref.state_dict())

    import jax

    n_flax = sum(p.size for p in jax.tree.leaves(params))
    n_torch = sum(p.numel() for p in ref.parameters())
    assert n_flax == n_torch

    # after alignment padding the tree matches the flax model exactly
    model = build_model(num_classes=len(LABELS) + 1, mask=True)
    rng = jax.random.PRNGKey(0)
    init = model.init(rng, jnp.zeros((1, 64, 64)), jnp.ones((1,)), False)
    padded = pad_to_match(params, init["params"])
    flat_init = jax.tree_util.tree_flatten_with_path(init["params"])[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(padded)[0]
    init_paths = {tuple(str(p) for p in path): leaf.shape for path, leaf in flat_init}
    conv_paths = {tuple(str(p) for p in path): leaf.shape for path, leaf in flat_conv}
    assert init_paths == conv_paths
