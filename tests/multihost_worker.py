"""Worker process for the 2-process multi-host test (not a pytest module).

Each worker is one JAX process with 4 virtual CPU devices (8 global across
the 2-process fleet, gloo collectives), mirroring the reference's
``num_nodes: 2`` DDP deployment (``/root/reference/conf/conf.yaml:31``,
``train.py:251``).  Runs one epoch of Trainer.fit + validate on a shared
synthetic corpus and dumps per-step losses + val metrics as JSON.

Usage: python multihost_worker.py <rank> <port> <manifest> <out_json> [tp]

With ``tp`` > 1 the 8 global devices form a (data=8//tp, model=tp) mesh:
tensor parallelism INSIDE the dp groups spanning both processes — the
real-pod layout a multi-host tp run uses (VERDICT r3 #5b).
"""

import json
import os
import sys


def main() -> None:
    rank, port, manifest, out = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    tp = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=rank)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lightning_asr_tpu.data import AsrDataModule
    from lightning_asr_tpu.models import build_model
    from lightning_asr_tpu.ops.frontend import MelFrontendConfig
    from lightning_asr_tpu.optim import cosine_annealing_warmup_restarts, novograd
    from lightning_asr_tpu.training import Trainer
    from lightning_asr_tpu.training.callbacks import Callback

    assert jax.process_count() == 2 and jax.device_count() == 8

    labels = [" ", "'"] + [chr(ord("a") + i) for i in range(26)]
    dm = AsrDataModule(
        train_manifest=manifest, dev_manifest=manifest, test_manifest=manifest,
        labels=labels, train_bs=8, dev_bs=8, bucket_seconds=(0.7,),
    )
    model = build_model(num_classes=len(labels) + 1, mask=True, drop_rate=0.0)
    schedule = cosine_annealing_warmup_restarts(
        first_cycle_steps=100, cycle_mult=2, max_lr=1e-3, min_lr=1e-5,
        warmup_steps=5, gamma=0.5)
    # tp requires the per-tensor NovoGrad (parallel/tp.py): its momentum
    # tree mirrors params, so the tp rules shard it leaf-for-leaf
    opt = novograd(schedule, betas=(0.8, 0.5), weight_decay=1e-3,
                   fused=(tp == 1))
    mesh = None
    if tp > 1:
        from lightning_asr_tpu.parallel import make_mesh

        mesh = make_mesh(8, axis_names=("data", "model"), shape=(8 // tp, tp))

    losses = []

    class Recorder(Callback):
        def on_train_batch_end(self, trainer, state, metrics, batch, batch_idx):
            losses.append(float(metrics["loss"]))

    # one SHARED run dir across processes (orbax saves collectively; host-side
    # writes happen on process 0 only)
    run_dir = os.path.join(os.path.dirname(out), "run_shared")
    trainer = Trainer(
        model, opt, dm, total_epochs=1, run_dir=run_dir,
        lr_schedule=schedule, log_every_n_steps=1000, train_wer_every_n_steps=1000,
        sample_log_every_n_batches=1000, frontend=MelFrontendConfig(),
        callbacks=[Recorder()], hparams={"labels": labels}, mesh=mesh,
    )
    state = trainer.fit()
    val = trainer.validate(state)
    shard_widths = None
    if tp > 1:  # record the locally visible trunk shard widths for the test
        k = state.params["encoder"]["block3"]["sep_last"]["pointwise_conv"]["kernel"]
        shard_widths = sorted({int(s.data.shape[-1]) for s in k.addressable_shards})
        shard_widths = {"local": shard_widths, "full": int(k.shape[-1])}
    with open(out, "w") as f:
        json.dump({"rank": rank, "losses": losses, "val": val, "tp": tp,
                   "shards": shard_widths,
                   "process_count": jax.process_count()}, f)
    print(f"worker {rank} done: {losses}", flush=True)


if __name__ == "__main__":
    main()
