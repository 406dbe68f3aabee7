"""Import reference (PyTorch) checkpoints into this framework.

Converts a ``kouyt5/lightning-asr`` checkpoint — a pytorch-lightning
``.ckpt`` whose ``state_dict`` holds the ``MyModel2`` weights
(``/root/reference/train.py:194-197``, ``models/QuartNetContext.py``) — into
this framework's flax ``params`` / ``batch_stats`` pytrees, so users
migrating from the reference keep their trained models.

Weight layout mapping (torch -> flax NWC):
  * Conv1d weight (out, in/groups, k)    -> kernel (k, in/groups, out)
  * Linear weight (out, in)              -> kernel (in, out)
  * BatchNorm1d weight/bias              -> bn scale/bias
    running_mean/running_var             -> batch_stats mean/var
  * LSTM weight_ih_l0[/ _reverse] etc.   -> w_ih_f / w_ih_b etc. (same shape)

Module-name mapping follows the identical block naming used in
``models/quartznet.py`` (block1, block12, ..., context_rnn, last_cnn2 ->
last_conv/last_bn, decoder); ``seq.{i}`` separable convs map to ``sep{i}``
with the final one as ``sep_last``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # (out, in, k) -> (k, in, out)


def _set(tree: dict, path: tuple, value: np.ndarray) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Dict[str, "object"],
) -> Tuple[dict, dict]:
    """torch state_dict (tensor or ndarray values) -> (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    def asnp(v) -> np.ndarray:
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                          np.float32)

    items = {}
    for key, value in state_dict.items():
        # strip LightningModule ("encoder.") and MyModel2 wrappers
        if key.startswith("encoder.encoder."):
            key = "encoder." + key[len("encoder.encoder."):]
        elif key.startswith("encoder.decoder."):
            key = "decoder." + key[len("encoder.decoder."):]
        elif key.startswith("encoder.feature_mapping."):
            key = "feature_mapping." + key[len("encoder.feature_mapping."):]
        items[key] = asnp(value)

    for key, w in items.items():
        parts = key.split(".")

        # --- decoder head: Conv1d with bias --------------------------------
        if parts[0] == "decoder":
            if parts[-1] == "weight":
                _set(params, ("decoder", "kernel"), _conv_kernel(w))
            elif parts[-1] == "bias":
                _set(params, ("decoder", "bias"), w)
            continue
        if parts[0] == "feature_mapping":
            if parts[-1] == "weight":
                _set(params, ("feature_mapping", "kernel"), w.T)
            else:
                _set(params, ("feature_mapping", "bias"), w)
            continue
        if parts[0] != "encoder":
            continue  # loss/metric buffers etc.

        sub = parts[1]

        # --- BiLSTM context branch ------------------------------------------
        if sub == "context_rnn":
            name = parts[-1]  # e.g. weight_ih_l0, bias_hh_l0_reverse
            direction = "b" if name.endswith("_reverse") else "f"
            stem = name.replace("_reverse", "")
            kind = {"weight_ih_l0": "w_ih", "weight_hh_l0": "w_hh",
                    "bias_ih_l0": "b_ih", "bias_hh_l0": "b_hh"}.get(stem)
            if kind:
                _set(params, ("encoder", "context_rnn", f"{kind}_{direction}"), w)
            continue

        # --- epilog 1x1 conv + BN (last_cnn2.0 / last_cnn2.1) ----------------
        if sub == "last_cnn2":
            idx, leaf = parts[2], parts[3]
            if idx == "0":
                if leaf == "weight":
                    _set(params, ("encoder", "last_conv", "kernel"), _conv_kernel(w))
                else:
                    _set(params, ("encoder", "last_conv", "bias"), w)
            elif idx == "1":
                _bn(params, stats, ("encoder", "last_bn"), leaf, w)
            continue

        # --- stem / blocks ----------------------------------------------------
        # reference: first_cnn is a SepConv; blocks hold seq.{i} SepConvs +
        # reside.{0,1}
        if sub == "first_cnn":
            _sepconv(params, stats, ("encoder", "first_cnn"), parts[2:], w)
            continue
        if sub.startswith("block"):
            rest = parts[2:]
            if rest[0] == "seq":
                i = int(rest[1])
                n_seq = _count_seq(items, f"encoder.{sub}.seq.")
                sep_name = "sep_last" if i == n_seq - 1 else f"sep{i}"
                _sepconv(params, stats, ("encoder", sub, sep_name), rest[2:], w)
            elif rest[0] == "reside":
                if rest[1] == "0" and rest[2] == "weight":
                    _set(params, ("encoder", sub, "reside_conv", "kernel"), _conv_kernel(w))
                elif rest[1] == "1":
                    _bn(params, stats, ("encoder", sub, "reside_bn"), rest[2], w)
            continue

    return params, stats


def _count_seq(items: dict, prefix: str) -> int:
    idxs = set()
    for key in items:
        if key.startswith(prefix):
            idxs.add(int(key[len(prefix):].split(".")[0]))
    return max(idxs) + 1 if idxs else 1


def _bn(params: dict, stats: dict, path: tuple, leaf: str, w: np.ndarray) -> None:
    if leaf == "weight":
        _set(params, path + ("scale",), w)
    elif leaf == "bias":
        _set(params, path + ("bias",), w)
    elif leaf == "running_mean":
        _set(stats, path + ("mean",), w)
    elif leaf == "running_var":
        _set(stats, path + ("var",), w)
    # num_batches_tracked: dropped


def _sepconv(params: dict, stats: dict, path: tuple, rest: list, w: np.ndarray) -> None:
    mod = rest[0]
    if mod == "depthwise_conv" and rest[1] == "weight":
        _set(params, path + ("depthwise_conv", "kernel"), _conv_kernel(w))
    elif mod == "pointwise_conv" and rest[1] == "weight":
        _set(params, path + ("pointwise_conv", "kernel"), _conv_kernel(w))
    elif mod == "bn":
        _bn(params, stats, path + ("bn",), rest[1], w)
    elif mod == "se":  # squeeze-excite: se.fc.0.weight / se.fc.2.weight
        if rest[-1] == "weight":
            idx = rest[2] if rest[1] == "fc" else rest[1]
            which = "fc1" if idx in ("0", "fc1") else "fc2"
            _set(params, path + ("se", which, "kernel"), w.T)


def pad_to_match(params: dict, template: dict) -> dict:
    """Zero-pad converted weights whose target (flax) shapes are larger —
    the TPU-alignment padding of the 336-channel context concat
    (``models/quartznet.py::QuartNet12Context.pad_context``) grows block3's
    input-channel dims from 336 to 384; zero padding there is mathematically
    inert, so padded imports produce identical outputs."""
    import jax

    def one(src, tgt):
        src = np.asarray(src)
        tgt_shape = np.shape(tgt)
        if src.shape == tuple(tgt_shape):
            return src
        if len(src.shape) != len(tgt_shape) or any(
            s > t for s, t in zip(src.shape, tgt_shape)
        ):
            raise ValueError(f"cannot pad {src.shape} to {tgt_shape}")
        pad = [(0, t - s) for s, t in zip(src.shape, tgt_shape)]
        return np.pad(src, pad)

    return jax.tree.map(one, params, jax.tree.map(np.asarray, template))


def load_reference_checkpoint(path: str | Path) -> Tuple[dict, dict, dict]:
    """Load a reference .ckpt (torch) -> (params, batch_stats, hparams)."""
    import torch

    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    params, stats = convert_state_dict(state_dict)
    return params, stats, hparams
