"""NovoGrad + schedules: parity against step-by-step numpy simulations of the
reference algorithms (``/root/reference/scheduler/novograd.py``,
``scheduler/cosine_annearing_with_warmup.py``)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from lightning_asr_tpu.optim import (
    ReduceLROnPlateau,
    cosine_annealing_warmup_restarts,
    get_lr_policy,
    novograd,
)


def numpy_novograd_run(params, grads_seq, lr, betas, eps, wd, grad_averaging=False):
    """Independent simulation of the NVIDIA NovoGrad update rule."""
    b1, b2 = betas
    p = {k: v.copy() for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v2 = {k: 0.0 for k in params}
    for grads in grads_seq:
        for k in p:
            g = grads[k].copy()
            norm = float((g * g).sum())
            v2[k] = norm if v2[k] == 0.0 else b2 * v2[k] + (1 - b2) * norm
            g = g / (math.sqrt(v2[k]) + eps)
            if wd:
                g = g + wd * p[k]
            if grad_averaging:
                g = g * (1 - b1)
            m[k] = b1 * m[k] + g
            p[k] = p[k] - lr * m[k]
    return p


@pytest.mark.parametrize("wd,grad_averaging", [(0.0, False), (1e-3, False), (1e-3, True)])
def test_novograd_matches_simulation(wd, grad_averaging):
    rng = np.random.default_rng(0)
    params = {"a": rng.standard_normal((3, 4)).astype(np.float32),
              "b": rng.standard_normal((5,)).astype(np.float32)}
    grads_seq = [
        {k: rng.standard_normal(v.shape).astype(np.float32) for k, v in params.items()}
        for _ in range(5)
    ]
    lr, betas, eps = 1e-2, (0.8, 0.5), 1e-8

    golden = numpy_novograd_run(params, grads_seq, lr, betas, eps, wd, grad_averaging)

    opt = novograd(lr, betas=betas, eps=eps, weight_decay=wd, grad_averaging=grad_averaging)
    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = opt.init(jp)
    for grads in grads_seq:
        jg = {k: jnp.asarray(v) for k, v in grads.items()}
        updates, state = opt.update(jg, state, jp)
        jp = optax.apply_updates(jp, updates)

    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), golden[k], rtol=1e-5, atol=1e-6)


def test_novograd_schedule_steps():
    """With a schedule, lr(t) is applied at optimizer step t (0-based)."""
    sched = lambda t: 0.1 / (1.0 + t.astype(jnp.float32))
    opt = novograd(sched, betas=(0.0, 0.5))  # beta1=0 -> m == normalized grad
    p = {"w": jnp.ones((2,))}
    state = opt.init(p)
    g = {"w": jnp.full((2,), 2.0)}
    updates, state = opt.update(g, state, p)
    # step 0: norm=8, denom=sqrt(8), g_n = 2/sqrt(8); lr = 0.1
    expected = -0.1 * 2.0 / math.sqrt(8.0)
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)
    updates, state = opt.update(g, state, p)
    # step 1: v = 0.5*8 + 0.5*8 = 8 -> same normalized grad; lr = 0.05
    np.testing.assert_allclose(np.asarray(updates["w"]), expected / 2, rtol=1e-5)


def python_cawr_lrs(n_steps, first_cycle_steps, cycle_mult, max_lr, min_lr, warmup_steps, gamma):
    """Independent simulation of the torch scheduler's sequential stepping."""
    lrs = []
    cycle, sic, cur_cycle_steps, cur_max = 0, 0, first_cycle_steps, max_lr
    for _ in range(n_steps):
        if sic < warmup_steps:
            lr = (cur_max - min_lr) * sic / warmup_steps + min_lr
        else:
            lr = min_lr + (cur_max - min_lr) * (
                1 + math.cos(math.pi * (sic - warmup_steps) / (cur_cycle_steps - warmup_steps))
            ) / 2
        lrs.append(lr)
        sic += 1
        if sic >= cur_cycle_steps:
            cycle += 1
            sic -= cur_cycle_steps
            cur_cycle_steps = int((cur_cycle_steps - warmup_steps) * cycle_mult) + warmup_steps
            cur_max = max_lr * (gamma ** cycle)
    return np.asarray(lrs)


@pytest.mark.parametrize("cycle_mult,gamma", [(2.0, 0.5), (1.0, 1.0), (1.5, 0.1)])
def test_cosine_warmup_restarts_matches_simulation(cycle_mult, gamma):
    kw = dict(first_cycle_steps=50, cycle_mult=cycle_mult, max_lr=1e-2,
              min_lr=1e-4, warmup_steps=10, gamma=gamma)
    golden = python_cawr_lrs(400, **kw)
    sched = cosine_annealing_warmup_restarts(**kw)
    ours = np.asarray(jax.vmap(sched)(jnp.arange(400)))
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-7)


def test_reduce_lr_on_plateau():
    ctrl = ReduceLROnPlateau(init_lr=1e-2, factor=0.1, patience=2, cooldown=0, min_lr=1e-4)
    ctrl.step(1.0)
    for _ in range(2):
        assert ctrl.step(1.0) == 1e-2  # within patience
    assert ctrl.step(1.0) == pytest.approx(1e-3)  # patience exceeded
    for _ in range(3):
        ctrl.step(0.99999)  # not better than best*(1-1e-4)
    assert ctrl.lr == pytest.approx(1e-4)
    ctrl.step(0.5)  # improvement resets
    for _ in range(10):
        ctrl.step(0.5)
    assert ctrl.lr >= 1e-4  # clamped at min


def test_lr_policy_zoo():
    for name, kwargs in [
        ("CosineAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10)),
        ("SquareAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10)),
        ("SquareRootAnnealing", dict(initial_lr=1e-2, total_steps=100)),
        ("WarmupAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10)),
        ("InverseSquareRootAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10)),
        ("PolynomialDecayAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10)),
        ("PolynomialHoldDecayAnnealing", dict(initial_lr=1e-2, total_steps=100, warmup_steps=10, hold_steps=20)),
    ]:
        sched = get_lr_policy(name, **kwargs)
        lrs = np.asarray(jax.vmap(sched)(jnp.arange(100)))
        assert np.all(np.isfinite(lrs)) and lrs.max() <= 1e-2 + 1e-9, name
        # warmup ramps up: lr(0) = initial*(1)/(w+1) < initial
        if kwargs.get("warmup_steps"):
            assert lrs[0] < 1e-2

    with pytest.raises(ValueError):
        get_lr_policy("NotAPolicy")


@pytest.mark.parametrize("amsgrad,luc", [(False, False), (True, False), (False, True)])
def test_novograd_fused_matches_unfused(amsgrad, luc):
    """The flat-buffer fused path must reproduce the per-tensor path across
    ragged shapes (incl. scalars and >1-chunk tensors), amsgrad and LUC."""
    rng = np.random.default_rng(1)
    params = {
        "w": rng.standard_normal((64, 77)).astype(np.float32),   # 4928 elems > 2 chunks
        "b": rng.standard_normal((3,)).astype(np.float32),
        "s": np.float32(rng.standard_normal()),                   # scalar leaf
        "k": rng.standard_normal((2049,)).astype(np.float32),     # chunk+1
    }
    kw = dict(betas=(0.8, 0.5), eps=1e-8, weight_decay=1e-3,
              amsgrad=amsgrad, luc=luc)
    runs = {}
    for fused in (False, True):
        opt = novograd(1e-2, fused=fused, **kw)
        jp = {k: jnp.asarray(v) for k, v in params.items()}
        state = opt.init(jp)
        r = np.random.default_rng(2)
        for _ in range(4):
            jg = {k: jnp.asarray(r.standard_normal(np.shape(v)).astype(np.float32))
                  for k, v in params.items()}
            updates, state = opt.update(jg, state, jp)
            jp = optax.apply_updates(jp, updates)
        runs[fused] = jp
    for k in params:
        np.testing.assert_allclose(np.asarray(runs[True][k]), np.asarray(runs[False][k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
