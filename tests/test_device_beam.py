"""Device prefix beam search vs a brute-force oracle and the C++ decoder."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from lightning_asr_tpu.decoding.device_beam import (
    DeviceBeamSearchDecoder,
    beam_search_device,
)


def brute_force_posteriors(log_probs: np.ndarray, length: int, blank: int):
    """Exact collapsed-sequence posteriors by enumerating all alignment
    paths (V+1)^T — the oracle the beam must match when exhaustive."""
    T, C = log_probs.shape
    out = {}
    for path in itertools.product(range(C), repeat=length):
        lp = sum(log_probs[t, c] for t, c in enumerate(path))
        seq = []
        prev = blank
        for c in path:
            if c != blank and c != prev:
                seq.append(c)
            prev = c
        key = tuple(seq)
        out[key] = np.logaddexp(out[key], lp) if key in out else lp
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exhaustive_beam_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    T, V = 6, 3  # (V+1)^T = 4096 paths
    logits = rng.standard_normal((1, T, V + 1)).astype(np.float32) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    oracle = brute_force_posteriors(log_probs[0], T, blank=V)
    best_seq, best_lp = max(oracle.items(), key=lambda kv: kv[1])

    # K large enough to hold every reachable prefix -> exact search
    prefixes, plens, scores = beam_search_device(
        jnp.asarray(log_probs), jnp.asarray([T]), beam_width=64)
    got = tuple(np.asarray(prefixes)[0, 0, : int(plens[0, 0])])
    assert got == best_seq
    # merged score must equal the exact marginal over alignments
    np.testing.assert_allclose(float(scores[0, 0]), best_lp, atol=5e-4)


def test_length_masking_and_batch():
    rng = np.random.default_rng(3)
    T, V, B = 8, 3, 3
    logits = rng.standard_normal((B, T, V + 1)).astype(np.float32) * 2.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([8, 5, 3], np.int32)

    prefixes, plens, scores = beam_search_device(
        jnp.asarray(log_probs), jnp.asarray(lengths), beam_width=64)
    for b in range(B):
        oracle = brute_force_posteriors(log_probs[b], int(lengths[b]), blank=V)
        best_seq, best_lp = max(oracle.items(), key=lambda kv: kv[1])
        got = tuple(np.asarray(prefixes)[b, 0, : int(plens[b, 0])])
        assert got == best_seq, f"row {b}"
        np.testing.assert_allclose(float(scores[b, 0]), best_lp, atol=5e-4)


def test_agrees_with_native_decoder():
    """Same top-1 text as the C++ prefix beam (no LM, no pruning)."""
    pytest.importorskip("lightning_asr_tpu.native")
    from lightning_asr_tpu.decoding.beam_search import BeamSearchDecoderWithLM

    vocab = [" ", "a", "b", "c"]
    rng = np.random.default_rng(7)
    B, T, C = 2, 32, len(vocab) + 1
    # peaked posteriors (realistic CTC output) so both searches agree on top-1
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 3.0
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    lengths = np.asarray([32, 20], np.int32)

    cpp = BeamSearchDecoderWithLM(vocab, beam_width=64, cutoff_prob=1.0,
                                  cutoff_top_n=C)
    dev = DeviceBeamSearchDecoder(vocab, beam_width=64)
    assert dev.forward(log_probs, lengths) == cpp.forward(log_probs, lengths)


def test_greedy_agreement_on_peaked_input():
    """With near-one-hot posteriors the beam equals greedy collapse."""
    from lightning_asr_tpu.decoding.greedy import greedy_decode_to_strings

    vocab = [" ", "a", "b"]
    ids = np.asarray([[1, 1, 3, 2, 2, 3, 1, 3]], np.int32)  # blank=3
    T, C = ids.shape[1], len(vocab) + 1
    log_probs = np.full((1, T, C), -20.0, np.float32)
    log_probs[0, np.arange(T), ids[0]] = 0.0
    lengths = np.asarray([T], np.int32)

    dev = DeviceBeamSearchDecoder(vocab, beam_width=8)
    assert dev.forward(log_probs, lengths) == \
        greedy_decode_to_strings(ids, lengths, vocab, blank_id=3)


def test_max_prefix_len_clamps_reported_length():
    """With max_prefix_len < T the write mask drops overflow chars; the
    reported prefix length must not run past the buffer (ADVICE r2)."""
    rng = np.random.default_rng(3)
    T, C = 8, 4
    lp = np.log(rng.dirichlet(np.ones(C), size=(1, T)).astype(np.float32))
    lp[:, :, -1] = -8.0  # discourage blank so prefixes grow past L
    prefixes, plens, _ = beam_search_device(
        jnp.asarray(lp), jnp.asarray([T], np.int32), beam_width=4,
        max_prefix_len=3)
    assert prefixes.shape[-1] == 3
    assert int(np.max(np.asarray(plens))) <= 3
