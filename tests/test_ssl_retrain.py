"""SSL retrain mode: raw waves -> flax wav2vec2 encoder -> QuartNet, one
graph, correct lengths; HF weight injection."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lightning_asr_tpu.ssl_codec.retrain import (
    SSLRetrainAsrModel,
    load_hf_encoder_into_params,
)
from lightning_asr_tpu.ssl_codec.wav2vec_flax import Wav2Vec2FeatureEncoderFlax

LABELS = [" ", "a", "b", "c"]


def test_retrain_model_forward_and_lengths():
    model = SSLRetrainAsrModel(num_classes=len(LABELS) + 1, mask=True,
                               feat_extract_norm="group", conv_bias=False)
    rng = jax.random.PRNGKey(0)
    B, S = 2, 16000
    waves = jax.random.normal(rng, (B, S)) * 0.1
    lens = jnp.asarray([S, S // 2], jnp.int32)
    variables = model.init({"params": rng, "dropout": rng, "augment": rng},
                           waves, lens, False)
    out, out_lens = model.apply(variables, waves, lens, False)

    T_feat = int(Wav2Vec2FeatureEncoderFlax.output_lengths(np.asarray([S]))[0])
    assert out.shape[0] == B and out.shape[2] == len(LABELS) + 1
    # encoder stride-2 halves the wav2vec frame count
    assert out.shape[1] == T_feat // 2 or out.shape[1] == (T_feat + 1) // 2
    assert int(out_lens[0]) == out.shape[1]
    np.testing.assert_allclose(np.exp(np.asarray(out[0, 0])).sum(), 1.0, rtol=1e-5)
    # the wav2vec encoder params are part of the trainable tree
    assert "wav2vec" in variables["params"]


def test_hf_weights_inject():
    transformers = pytest.importorskip("transformers")
    from transformers import Wav2Vec2Config
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2FeatureEncoder

    cfg = Wav2Vec2Config(feat_extract_norm="group", conv_bias=False)
    torch.manual_seed(0)
    hf = Wav2Vec2FeatureEncoder(cfg)

    model = SSLRetrainAsrModel(num_classes=5, mask=True,
                               feat_extract_norm="group", conv_bias=False)
    rng = jax.random.PRNGKey(0)
    waves = jnp.zeros((1, 4000))
    lens = jnp.full((1,), 4000, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng, "augment": rng},
                           waves, lens, False)
    new_params = load_hf_encoder_into_params(variables["params"], hf.state_dict(),
                                             norm="group")

    # shapes line up with the model's own init
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"]["wav2vec"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(new_params["wav2vec"])[0]
    assert {tuple(map(str, p)): np.shape(l) for p, l in flat_a} == \
           {tuple(map(str, p)): np.shape(l) for p, l in flat_b}

    # and the injected encoder matches HF numerically through the model edge
    rng_np = np.random.default_rng(1)
    x = rng_np.standard_normal((1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        golden = hf(torch.from_numpy(x)).transpose(1, 2).numpy()
    enc = Wav2Vec2FeatureEncoderFlax(feat_extract_norm="group", conv_bias=False)
    ours = np.asarray(enc.apply({"params": new_params["wav2vec"]}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, golden, rtol=1e-3, atol=1e-4)


def test_raw_ssl_train_step_mechanics():
    """Exercise make_raw_ssl_train_step's grads/optimizer/NaN-guard wiring
    with a tiny stand-in model (same (waves, lens, train) signature)."""
    import flax.linen as nn
    import optax

    from lightning_asr_tpu.optim import novograd
    from lightning_asr_tpu.training.steps import (
        AsrTrainState, make_raw_ssl_eval_step, make_raw_ssl_train_step)

    C = 5

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, waves, wave_lens, train=False):
            x = waves.reshape(waves.shape[0], -1, 100)       # (B, T, 100)
            if train:
                self.make_rng("augment")                     # rng plumbing
                x = x * (1.0 - nn.Dropout(0.1, deterministic=False)(
                    jnp.zeros_like(x)))
            x = nn.Dense(C)(x)
            log_probs = nn.log_softmax(x, axis=-1)
            out_lens = wave_lens // 100
            return log_probs, out_lens

    model = TinyModel()
    rng = jax.random.PRNGKey(0)
    waves = jax.random.normal(rng, (4, 2000)) * 0.1
    lens = jnp.full((4,), 2000, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng, "augment": rng},
                           waves, lens, True)
    opt = novograd(1e-2, betas=(0.8, 0.5), weight_decay=1e-3)
    state = AsrTrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
        nan_count=jnp.zeros((), jnp.int32))

    batch = {"waves": waves, "wave_lens": lens,
             "targets": jnp.ones((4, 8), jnp.int32),
             "target_lens": jnp.full((4,), 4, jnp.int32)}
    step = jax.jit(make_raw_ssl_train_step(model, opt, blank_id=C - 1))
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1 and int(state.nan_count) == 0
    assert metrics["preds"].shape == (4, 20)

    eval_step = jax.jit(make_raw_ssl_eval_step(model, blank_id=C - 1))
    out = eval_step(state, batch)
    assert np.isfinite(np.asarray(out["losses"])).all()
