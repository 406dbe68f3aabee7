#!/usr/bin/env python
"""Real-TPU Pallas parity gate.

The test suite runs the Pallas CTC / LSTM kernels in ``interpret=True`` mode
on the CPU mesh, so compiled Mosaic numerics are never exercised by CI.  This
script closes that gap: on the real chip it runs the COMPILED kernels
(``ops/ctc_pallas.py``, ``ops/lstm_pallas.py``) against the lax.scan
references (``ops/ctc.py``, ``ops/lstm.py``) — forward values AND gradients —
and writes a JSON verdict to ``PALLAS_PARITY.json`` at the repo root.

Run: ``python scripts/pallas_parity.py`` (requires a TPU backend; refuses to
certify in interpret mode).  Exits nonzero if any tolerance is violated.

Semantics under test are the reference's ``torch.nn.CTCLoss(blank=V)``
(/root/reference/train.py:196) and packed-sequence BiLSTM
(/root/reference/models/QuartNetContext.py:186-199).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import importlib

# the ops package re-exports functions named like their modules; import the
# modules explicitly
ctc_scan = importlib.import_module("lightning_asr_tpu.ops.ctc")
ctc_pallas = importlib.import_module("lightning_asr_tpu.ops.ctc_pallas")
lstm_scan = importlib.import_module("lightning_asr_tpu.ops.lstm")
lstm_pallas = importlib.import_module("lightning_asr_tpu.ops.lstm_pallas")
from lightning_asr_tpu.ops.lstm import LSTMWeights
from lightning_asr_tpu.utils import enable_compile_cache


def _err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    abs_err = float(np.max(np.abs(a - b)))
    denom = np.maximum(np.abs(a), 1e-6)
    rel_err = float(np.max(np.abs(a - b) / denom))
    return abs_err, rel_err


def check_ctc(rng: np.random.Generator) -> list[dict]:
    results = []
    # (B, T, C, L): realistic CTC shapes incl. blank-heavy vocab + empty target
    for B, T, C, L in [(8, 96, 29, 24), (4, 640, 29, 120), (2, 128, 64, 16)]:
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        input_lengths = jnp.asarray(
            rng.integers(2 * L + 1, T + 1, size=(B,)), jnp.int32)
        targets = jnp.asarray(rng.integers(0, C - 1, size=(B, L)), jnp.int32)
        target_lengths = jnp.asarray(
            rng.integers(1, L + 1, size=(B,)), jnp.int32)
        target_lengths = target_lengths.at[0].set(0)  # empty-target edge case
        blank = C - 1

        def loss_and_grad(fn):
            def scalar(lp):
                return jnp.sum(fn(lp, input_lengths, targets, target_lengths, blank))
            val = fn(log_probs, input_lengths, targets, target_lengths, blank)
            grad = jax.grad(scalar)(log_probs)
            return jax.jit(lambda: (val, grad))()

        (v_ref, g_ref) = loss_and_grad(ctc_scan.ctc_loss)
        (v_pal, g_pal) = loss_and_grad(ctc_pallas.ctc_loss_pallas)
        fwd_abs, fwd_rel = _err(v_ref, v_pal)
        g_abs, g_rel = _err(g_ref, g_pal)
        results.append({
            "op": "ctc", "shape": [B, T, C, L],
            "fwd_abs_err": fwd_abs, "fwd_rel_err": fwd_rel,
            "grad_abs_err": g_abs, "grad_rel_err": g_rel,
            # grads are softmax-occupancy-scale (O(0.1-1)); compiled Mosaic
            # exp/log differs from scan at the ~1e-3 fp32 level, harmless for
            # training. Forward losses must agree to fp32 exactness.
            "ok": bool(fwd_abs < 1e-2 and fwd_rel < 1e-4 and g_abs < 2e-3),
        })
    return results


def check_lstm(rng: np.random.Generator) -> list[dict]:
    results = []
    for B, T, I, H in [(8, 96, 256, 40), (4, 250, 64, 40)]:
        x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32) * 0.2)
        lengths = jnp.asarray(rng.integers(1, T + 1, size=(B,)), jnp.int32)
        lengths = lengths.at[0].set(T)

        def mk_weights(key):
            ks = jax.random.split(key, 4)
            s = 1.0 / np.sqrt(H)
            return LSTMWeights(
                w_ih=jax.random.uniform(ks[0], (4 * H, I), minval=-s, maxval=s),
                w_hh=jax.random.uniform(ks[1], (4 * H, H), minval=-s, maxval=s),
                b_ih=jax.random.uniform(ks[2], (4 * H,), minval=-s, maxval=s),
                b_hh=jax.random.uniform(ks[3], (4 * H,), minval=-s, maxval=s),
            )

        fw = mk_weights(jax.random.PRNGKey(0))
        bw = mk_weights(jax.random.PRNGKey(1))

        def run(fn):
            def scalar(x_, fw_, bw_):
                out = fn(x_, lengths, fw_, bw_)
                return jnp.sum(out * out)  # quadratic: nontrivial grads
            out = fn(x, lengths, fw, bw)
            gx, gfw, gbw = jax.grad(scalar, argnums=(0, 1, 2))(x, fw, bw)
            return jax.jit(lambda: (out, gx, gfw, gbw))()

        out_ref, gx_ref, gfw_ref, gbw_ref = run(lstm_scan.lstm)
        out_pal, gx_pal, gfw_pal, gbw_pal = run(lstm_pallas.lstm_pallas)
        fwd_abs, _ = _err(out_ref, out_pal)
        gx_abs, _ = _err(gx_ref, gx_pal)
        gw_abs = max(
            max(_err(a, b)[0] for a, b in zip(gfw_ref, gfw_pal)),
            max(_err(a, b)[0] for a, b in zip(gbw_ref, gbw_pal)),
        )
        results.append({
            "op": "bilstm", "shape": [B, T, I, H],
            "fwd_abs_err": fwd_abs, "grad_x_abs_err": gx_abs,
            "grad_w_abs_err": gw_abs,
            "ok": bool(fwd_abs < 1e-4 and gx_abs < 1e-3 and gw_abs < 1e-2),
        })
    return results


def check_sepconv(rng: np.random.Generator) -> list[dict]:
    """Fused separable conv (``ops/sepconv_pallas.py``) vs the XLA
    composition, fwd + all three grads, at flagship block configs."""
    sep = importlib.import_module("lightning_asr_tpu.ops.sepconv_pallas")
    results = []
    for B, T, Cin, Cout, k in [(4, 256, 256, 256, 33), (2, 256, 336, 512, 51),
                               (2, 128, 512, 1024, 87)]:
        x = jnp.asarray(rng.standard_normal((B, T, Cin)).astype(np.float32) * 0.3)
        wd = jnp.asarray(rng.standard_normal((k, Cin)).astype(np.float32) * 0.1)
        wp = jnp.asarray(rng.standard_normal((Cin, Cout)).astype(np.float32) * 0.05)

        def run(fn):
            # pin every dot/conv on both sides to 6-pass fp32 so the check
            # compares kernel MATH, not XLA-vs-Mosaic default matmul
            # decompositions (bf16-pass count differs otherwise)
            with jax.default_matmul_precision("highest"):
                def scalar(x_, wd_, wp_):
                    y = fn(x_, wd_, wp_)
                    return jnp.sum(y * y)
                y = fn(x, wd, wp)
                gx, gwd, gwp = jax.grad(scalar, argnums=(0, 1, 2))(x, wd, wp)
                return jax.jit(lambda: (y, gx, gwd, gwp))()

        y_r, gx_r, gwd_r, gwp_r = run(sep.sepconv_reference)
        y_p, gx_p, gwd_p, gwp_p = run(lambda a, b, c: sep.sepconv(a, b, c, None))
        fwd_abs, _ = _err(y_r, y_p)
        g_abs = max(_err(gx_r, gx_p)[0], _err(gwd_r, gwd_p)[0] / max(float(jnp.abs(gwd_r).max()), 1.0),
                    _err(gwp_r, gwp_p)[0] / max(float(jnp.abs(gwp_r).max()), 1.0))
        results.append({
            "op": "sepconv", "shape": [B, T, Cin, Cout, k],
            "fwd_abs_err": fwd_abs, "grad_rel_err": g_abs,
            "ok": bool(fwd_abs < 1e-3 and g_abs < 1e-3),
        })
    return results


def check_depthwise_wgrad(rng: np.random.Generator) -> list[dict]:
    """Hybrid depthwise conv (``ops/depthwise_pallas.py``: XLA fwd/dgrad +
    Pallas wgrad) vs plain autodiff of the XLA conv at flagship shapes."""
    dw = importlib.import_module("lightning_asr_tpu.ops.depthwise_pallas")
    results = []
    for B, T, C, k in [(4, 256, 256, 33), (2, 256, 336, 51),
                       (2, 128, 512, 87)]:
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)
        wd = jnp.asarray(rng.standard_normal((k, C)).astype(np.float32) * 0.1)

        def run(fn):
            with jax.default_matmul_precision("highest"):
                def scalar(x_, wd_):
                    y = fn(x_, wd_)
                    return jnp.sum(y * y)
                y = fn(x, wd)
                gx, gwd = jax.grad(scalar, argnums=(0, 1))(x, wd)
                return jax.jit(lambda: (y, gx, gwd))()

        y_r, gx_r, gwd_r = run(dw._dw_conv)
        y_p, gx_p, gwd_p = run(lambda a, b: dw.depthwise_conv1d(a, b, None))
        fwd_abs, _ = _err(y_r, y_p)
        g_abs = max(_err(gx_r, gx_p)[0],
                    _err(gwd_r, gwd_p)[0] / max(float(jnp.abs(gwd_r).max()), 1.0))
        results.append({
            "op": "depthwise_wgrad", "shape": [B, T, C, k],
            "fwd_abs_err": fwd_abs, "grad_rel_err": g_abs,
            "ok": bool(fwd_abs < 1e-4 and g_abs < 1e-3),
        })
    return results


def check_frontend_extend(rng: np.random.Generator) -> list[dict]:
    """Fused preemph+extend (``ops/frontend_pallas.py``) vs the XLA
    composition; exercises the dynamic-offset tail read-modify-write."""
    from lightning_asr_tpu.ops.frontend import (
        MelFrontendConfig, _extend_signal, _preemphasis)
    from lightning_asr_tpu.ops.frontend_pallas import extend_preemph

    results = []
    cfg = MelFrontendConfig()
    B, S = 8, 56000
    waves = jnp.asarray((rng.standard_normal((B, S)) * 0.1).astype(np.float32))
    lens = jnp.asarray(
        np.r_[S, rng.integers(cfg.n_fft, S, size=B - 1)].astype(np.int32))
    want = _extend_signal(_preemphasis(waves, None, cfg.preemph), lens, cfg)
    got = extend_preemph(waves, lens, None, cfg)
    abs_err, _ = _err(want, got[:, : want.shape[1]])
    tail_zero = float(jnp.abs(got[:, want.shape[1]:]).max())
    results.append({
        "op": "frontend_extend", "shape": [B, S],
        "fwd_abs_err": abs_err, "surplus_max": tail_zero,
        "ok": bool(abs_err < 1e-5 and tail_zero == 0.0),
    })
    return results


def check_mel_kernel(rng: np.random.Generator) -> list[dict]:
    """Fused DFT+power+mel kernel (training tier) vs the on-chip XLA
    default tier: same bf16-multiply/fp32-accumulate semantics and chunk
    order, so raw dB deltas are bf16 rounding noise and post-normalization
    deltas (what the model actually consumes) are ~1e-4 sigma."""
    from lightning_asr_tpu.ops.frontend import (
        MelFrontendConfig, log_mel_spectrogram, normalize_features,
        set_mel_pallas)

    cfg = MelFrontendConfig(dither=0.0, precision="default")
    B, S = 8, 180000
    waves = jnp.asarray((rng.standard_normal((B, S)) * 0.2).astype(np.float32))
    lens = jnp.asarray(
        np.r_[S, rng.integers(16000, S, size=B - 1)].astype(np.int32))
    set_mel_pallas(False)
    ref, rl = log_mel_spectrogram(waves, lens, cfg)
    set_mel_pallas(True)
    got, gl = log_mel_spectrogram(waves, lens, cfg)
    nr = np.asarray(normalize_features(ref, rl))
    ng = np.asarray(normalize_features(got, gl))
    ref, got = np.asarray(ref), np.asarray(got)
    db_err = sig_err = 0.0
    for b in range(B):
        Tv = int(np.asarray(rl)[b])
        db_err = max(db_err, float(np.abs(got[b, :Tv] - ref[b, :Tv]).max()))
        sig_err = max(sig_err, float(np.abs(ng[b, :Tv] - nr[b, :Tv]).max()))
    return [{
        "op": "mel_kernel", "shape": [B, S],
        "db_err_vs_xla_default": db_err,
        "postnorm_sigma_err": sig_err,
        "lens_equal": bool(np.array_equal(np.asarray(rl), np.asarray(gl))),
        "ok": bool(db_err < 0.05 and sig_err < 0.01
                   and np.array_equal(np.asarray(rl), np.asarray(gl))),
    }]


def main() -> int:
    enable_compile_cache()
    backend = jax.default_backend()
    interpreted = backend == "cpu"
    rng = np.random.default_rng(0)

    results = []
    for check in (check_ctc, check_lstm, check_sepconv,
                  check_depthwise_wgrad, check_frontend_extend,
                  check_mel_kernel):
        print(f"[parity] {check.__name__} ...", flush=True)
        results += check(rng)
        print(f"[parity] {check.__name__} done "
              f"({sum(r['ok'] for r in results)}/{len(results)} ok)",
              flush=True)
    ok = all(r["ok"] for r in results) and not interpreted
    report = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "compiled_mosaic": not interpreted,
        "results": results,
        "ok": ok,
    }
    out = Path(__file__).resolve().parents[1] / "PALLAS_PARITY.json"
    out.write_text(json.dumps(report, indent=2) + "\n")
    print(json.dumps(report, indent=2))
    if interpreted:
        print("REFUSING to certify: interpret mode (cpu backend)", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
