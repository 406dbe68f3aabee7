#!/usr/bin/env python
"""Convert a reference (pytorch-lightning) .ckpt into a lightning-asr-tpu
checkpoint directory usable by AsrTranslator / Trainer resume.

    python scripts/import_torch_ckpt.py --ckpt asr-epoch93-val_wer0.16.ckpt \
        --out outputs/imported --encoder quartznet12_context

The torch state_dict is mapped into flax params/batch_stats
(utils/torch_import.py); labels come from --labels, a vocab file, or the
default English set.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt path")
    ap.add_argument("--out", required=True, help="output checkpoint root dir")
    ap.add_argument("--encoder", default="quartznet12_context")
    ap.add_argument("--labels", default=None,
                    help="vocab file (flips CER) or comma-separated labels")
    ap.add_argument("--feature_in", type=int, default=None,
                    help="512 for SSL checkpoints with a feature_mapping")
    args = ap.parse_args()

    import jax.numpy as jnp

    from lightning_asr_tpu.data.vocab import Vocabulary
    from lightning_asr_tpu.inference.predict import AsrTranslator
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.optim import novograd
    from lightning_asr_tpu.training.checkpoint import CheckpointManager
    from lightning_asr_tpu.training.steps import AsrTrainState
    from lightning_asr_tpu.utils.torch_import import load_reference_checkpoint

    if args.labels is None:
        vocab = Vocabulary(AsrTranslator.EN_LABELS)
    elif Path(args.labels).exists():
        vocab = Vocabulary.from_config(args.labels)
    else:
        vocab = Vocabulary(args.labels.split(","))

    params, stats, ref_hparams = load_reference_checkpoint(args.ckpt)
    n = sum(np.asarray(p).size for p in _leaves(params))
    print(f"converted {n / 1e6:.2f}M parameters "
          f"(reference hparams: {sorted(ref_hparams)})")

    # zero-pad to the TPU-aligned flax shapes (mathematically inert)
    from lightning_asr_tpu.utils.torch_import import pad_to_match

    template_model = build_model(num_classes=vocab.num_classes, encoder=args.encoder,
                                 mask=bool(ref_hparams.get("mask", True)),
                                 feature_in=args.feature_in)
    import jax

    feat_dim0 = args.feature_in or 64
    template = template_model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, feat_dim0)), jnp.ones((1,)), False)
    params = pad_to_match(params, template["params"])
    stats = pad_to_match(stats, template.get("batch_stats", {}))

    opt = novograd(1e-3, betas=(0.8, 0.5))
    state = AsrTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=opt.init(params),
        nan_count=jnp.zeros((), jnp.int32),
    )
    hparams = {
        "labels": vocab.labels,
        "use_cer": vocab.use_cer,
        "encoder": args.encoder,
        "mask": bool(ref_hparams.get("mask", True)),
        "drop_rate": float(ref_hparams.get("drop_rate", 0.0)),
    }
    if args.feature_in:
        hparams["feature_in"] = args.feature_in
        hparams["in_c"] = 64

    mgr = CheckpointManager(args.out, top_k=1)
    mgr.save(state, epoch=int(ref_hparams.get("total_epoch", 0)),
             metrics={}, hparams=hparams)
    print(f"wrote {Path(args.out) / 'last'}")

    # smoke: the converted tree loads into the target model
    model = build_model(num_classes=vocab.num_classes, encoder=args.encoder,
                        mask=hparams["mask"], feature_in=args.feature_in)
    feat_dim = args.feature_in or 64
    out, lens = model.apply({"params": params, "batch_stats": stats},
                            jnp.zeros((1, 64, feat_dim)), jnp.ones((1,)), False)
    print(f"forward smoke OK: {out.shape}")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
