"""Trainer — the training system tying data, model, optimizer, parallelism,
checkpoints, loggers and the profiler together.

Capabilities mirrored from the reference's pl.Trainer usage
(``/root/reference/train.py:201-253``): epoch loop with per-step LR
scheduling, val every N epochs with val_wer/val_loss, top-3 + last
checkpointing on val_wer, resume, LR monitoring, per-50-batch decoded sample
logging (``train.py:82-85``), a simple profiler report, and a final test
pass.  TPU-native behaviors: one jitted graph per duration bucket (static
shapes), batches sharded over the ``data`` mesh axis (DDP analog: XLA psum
over ICI), background host prefetch, in-graph NaN-skip guard.
"""

from __future__ import annotations

import itertools
import logging
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datamodule import AsrDataModule
from ..data.pipeline import Batch, prefetch
from ..decoding.greedy import greedy_decode_to_strings
from ..metrics.wer import WER
from ..ops.frontend import MelFrontendConfig
from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from .checkpoint import CheckpointManager
from .loggers import BaseLogger, MultiLogger
from .profiler import SimpleProfiler
from .steps import AsrTrainState, make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def _local_np(arr) -> np.ndarray:
    """Fetch an output array host-side. Batch-sharded outputs are not fully
    addressable on multi-host — return this process's contiguous rows (which
    align with the batcher's row-slice); replicated/single-host arrays pass
    through."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start if s.index[0].start else 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _find_hyperparams_state(opt_state):
    """Locate the inject_hyperparams sub-state inside a possibly-chained
    optimizer state (gradient clipping wraps the optimizer in optax.chain,
    so the runtime-lr state is nested one tuple deep)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, tuple):
        for sub in opt_state:
            found = _find_hyperparams_state(sub)
            if found is not None:
                return found
    return None


def _resolve_batch_limit(limit, batcher) -> Optional[int]:
    """Lightning ``limit_{train,val}_batches`` semantics — the reference
    pins both to 1.0 = everything (``/root/reference/train.py:245-246``):
    a float < 1.0 is a fraction of the loader's batches, an int is an
    absolute batch count (0 disables the loop), 1.0/None means no cap."""
    if limit is None:
        return None
    if isinstance(limit, float):
        if limit >= 1.0:
            return None
        if limit <= 0.0:
            return 0
        return max(int(round(len(batcher) * limit)), 1)
    return max(int(limit), 0)


class Trainer:
    def __init__(
        self,
        model,
        optimizer,
        datamodule: AsrDataModule,
        total_epochs: int = 100,
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 10,
        sample_log_every_n_batches: int = 50,
        train_wer_every_n_steps: int = 10,
        run_dir: str | Path = "outputs/run",
        loggers: Optional[BaseLogger] = None,
        lr_schedule: Optional[Callable] = None,
        frontend: MelFrontendConfig = MelFrontendConfig(),
        augment: bool | str | None = True,
        freq_mask: float | int = 27,
        time_mask: float | int = 0.07,
        normalize: bool = True,
        mesh=None,
        checkpoint_top_k: int = 3,
        seed: int = 0,
        hparams: Optional[dict] = None,
        from_features: bool = False,
        callbacks: Optional[list] = None,
        plateau=None,
        plateau_monitor: str = "val_loss",
        device_cache: bool = False,
        accumulate_grad_batches: int = 1,
        limit_train_batches: float | int | None = 1.0,
        limit_val_batches: float | int | None = 1.0,
    ):
        """``device_cache=True`` keeps every train batch resident in HBM
        after epoch 0: later epochs iterate the SAME device arrays in a
        reshuffled order — zero host decode and zero host->device transfer
        in steady state.  The cached batches carry UNCROPPED waveforms and
        the reference's random crop runs IN-GRAPH per step
        (``ops.augment.wave_crop``), so every replay epoch re-rolls the
        crop exactly like the host loader does per epoch; SpecAugment stays
        fresh because the step RNG folds in ``state.step``.  Batch
        COMPOSITION (bucket membership and batch grouping, by uncropped
        length) is what epoch 0 freezes.  Intended for corpora that fit
        device memory (~1 GB per 8 audio-hours as int16) and for isolating
        device throughput from host/transfer bottlenecks."""
        self.model = model
        self.optimizer = optimizer
        self.dm = datamodule
        self.vocab = datamodule.vocab
        self.total_epochs = total_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.log_every_n_steps = log_every_n_steps
        self.sample_log_every_n_batches = sample_log_every_n_batches
        self.train_wer_every_n_steps = train_wer_every_n_steps
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.loggers = loggers or MultiLogger([])
        self.lr_schedule = lr_schedule
        self.frontend = frontend
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.hparams = dict(hparams or {})
        # Carry every inference-relevant setting in the checkpoint so
        # AsrTranslator rebuilds the *training* pipeline exactly — the
        # reference's load_from_checkpoint contract includes numerics
        # (``/root/reference/predict.py:37``): frontend config (precision
        # tier shifts the feature distribution BN stats were calibrated on),
        # conv compute dtype, and normalization mode. Explicit hparams win.
        import dataclasses

        self.hparams.setdefault("frontend", dataclasses.asdict(frontend))
        model_dtype = getattr(model, "dtype", None)
        self.hparams.setdefault(
            "compute_dtype",
            jnp.dtype(model_dtype).name if model_dtype is not None else "float32")
        self.hparams.setdefault("normalize", bool(normalize))
        self.hparams.setdefault("from_features", bool(from_features))
        self.rng = jax.random.PRNGKey(seed)
        self.profiler = SimpleProfiler()
        self.wer = WER(self.vocab.labels, self.vocab.use_cer)
        self.checkpoints = CheckpointManager(self.run_dir / "checkpoints", checkpoint_top_k)
        self.epoch = 0
        self.global_step = 0  # host-side mirror of state.step (avoids per-step sync)
        self.epoch_stats: list[dict] = []  # per-epoch wall/audio-sec (bench_e2e)
        self.from_features = from_features
        self.callbacks = list(callbacks or [])
        self.should_stop = False
        # ReduceLROnPlateau host controller (the reference's train-100
        # recipe): requires the optimizer to be wrapped in
        # optax.inject_hyperparams so lr is a runtime value, not a compiled
        # constant.
        self.plateau = plateau
        self.plateau_monitor = plateau_monitor
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.device_cache = device_cache
        self._epoch_cache: Optional[list] = None  # [(Batch, dev_batch)]
        # device_cache: stage UNCROPPED waves (host crop off) and re-roll
        # the reference crop in-graph on every step, so replay epochs train
        # the exact recipe instead of a frozen-crop variant
        crop_in_graph = False
        if device_cache and getattr(datamodule, "crop", False) and not from_features:
            datamodule.crop = False
            crop_in_graph = True
        self._crop_in_graph = crop_in_graph

        self._train_fn = make_train_step(
            model, optimizer, self.vocab.blank_id, frontend,
            augment=augment, freq_mask=freq_mask, time_mask=time_mask,
            from_features=from_features, normalize=normalize,
            crop=crop_in_graph,
            crop_weight=getattr(datamodule, "crop_weight", 0.98),
            accum_steps=int(accumulate_grad_batches),
        )
        self._train_step = jax.jit(self._train_fn, donate_argnums=(0,))
        self._train_step_pinned = None  # built lazily for tp meshes
        self._eval_step = jax.jit(
            make_eval_step(model, self.vocab.blank_id, frontend,
                           from_features=from_features, normalize=normalize)
        )
        self._batch_sharding = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)
        # Tensor parallelism: a mesh with a >1 'model' axis shards the conv
        # trunk per parallel/tp.py; on a 1-D (or model=1) mesh _place_state
        # degenerates to full replication, the DDP-analog default.
        self._tp = int(self.mesh.shape.get("model", 1))
        # The activation-layout pin (grouped-conv wgrads are miscompiled on
        # >=2-D meshes without it, parallel/tp.py) is SCOPED to each call
        # that can trace a step — see _tp_scope — so building a tp Trainer
        # no longer leaks a with_sharding_constraint mesh into later
        # dp-only tracing or inference in the same process.
        from ..parallel.tp import tp_mesh_scope

        self._tp_scope = lambda: tp_mesh_scope(self.mesh)
        self._n_procs = jax.process_count()
        # Multi-process: every newly compiled executable's FIRST collective
        # runs a key-value exchange with a hard ~30 s deadline (gloo on CPU;
        # similar rendezvous on TPU pods), but big-graph compiles can skew
        # processes by minutes under host load — observed as `Gloo context
        # initialization failed: DEADLINE_EXCEEDED: GetKeyValue()` in the
        # 2-process test.  So in multi-process mode train steps are compiled
        # ahead-of-time per batch shape and a coordination-service barrier
        # (NOT a collective) aligns all processes before the first execution
        # of each new executable; see _run_train_step.
        self._aot_train_steps: dict = {}
        if self._n_procs > 1:
            self._check_shard_layout()

    def _check_shard_layout(self) -> None:
        """The multi-host batcher hands each process the contiguous row-slice
        [rank*rpp, (rank+1)*rpp) of the global batch; that is only correct if
        the mesh's device order is process-major along the data axis. Verify
        once at init.  On a dp x tp mesh each row is replicated over the
        'model' axis, so the check is on the UNION of rows this process's
        devices own, not one-row-per-device."""
        n_dev = self.mesh.devices.size
        probe = (n_dev,)  # n_dev rows, sharded over 'data' only
        idx_map = self._batch_sharding.addressable_devices_indices_map(probe)
        owned: set[int] = set()
        for s in idx_map.values():
            start = s[0].start if s[0].start is not None else 0
            stop = s[0].stop if s[0].stop is not None else n_dev
            owned.update(range(start, stop))
        rpp = n_dev // self._n_procs
        expect = set(range(jax.process_index() * rpp, (jax.process_index() + 1) * rpp))
        if owned != expect:
            raise RuntimeError(
                f"mesh device order is not process-major: process "
                f"{jax.process_index()} owns rows {sorted(owned)}, expected "
                f"{sorted(expect)}; build the mesh from jax.devices() default "
                "order for multi-host runs")

    # ------------------------------------------------------------------
    def init_state(self) -> AsrTrainState:
        from .steps import create_train_state

        feat_dim = getattr(self.model, "feature_in", None) or getattr(self.model, "in_c", 64)
        with self._tp_scope():
            state = create_train_state(
                self.model, self.optimizer, self.rng, feature_shape=(1, 320, feat_dim)
            )
        return self._place_state(state)

    def _place_state(self, state: AsrTrainState) -> AsrTrainState:
        """Replicated on a data-only mesh; conv trunk + its BN/momentum
        sharded over the 'model' axis on a dp x tp mesh (parallel/tp.py)."""
        if self._tp > 1:
            from ..parallel.tp import shard_state

            return shard_state(state, self.mesh)
        return jax.device_put(state, self._replicated)

    def _device_batch(self, batch: Batch) -> dict:
        n_dev = self.mesh.devices.size
        arrays = {
            "waves": batch.waves,
            "wave_lens": batch.wave_lens,
            "prev_samples": batch.prev_samples,
            "targets": batch.targets,
            "target_lens": batch.target_lens,
        }
        if batch.extra:
            arrays.update(batch.extra)
        if batch.global_size is not None:
            # Multi-host: arrays hold this process's contiguous row-slice of a
            # global batch (pre-padded by the batcher); stitch the global
            # jax.Array from per-process shards. The reference delegated this
            # to PL's DDP sampler + NCCL (/root/reference/train.py:233-251).
            return {
                k: jax.make_array_from_process_local_data(
                    self._batch_sharding, v, (batch.global_size,) + v.shape[1:])
                for k, v in arrays.items()
            }
        B = batch.waves.shape[0]
        if B % n_dev != 0:  # pad rows to a multiple of mesh size (eval tail)
            padded_B = -(-B // n_dev) * n_dev
            arrays = {
                k: np.concatenate([v, np.zeros((padded_B - B,) + v.shape[1:], v.dtype)])
                for k, v in arrays.items()
            }
            # zero-length rows break per-utterance normalization; keep 1 sample
            arrays["wave_lens"][B:] = 160
        return {k: jax.device_put(v, self._batch_sharding) for k, v in arrays.items()}

    # ------------------------------------------------------------------
    def fit(self, resume: Optional[str] = None,
            initial_state: Optional[AsrTrainState] = None) -> AsrTrainState:
        state = initial_state if initial_state is not None else self.init_state()
        start_epoch = 0
        if resume:
            state, meta = self.checkpoints.restore(state, resume)
            state = self._place_state(state)
            start_epoch = int(meta.get("epoch", -1)) + 1
            if self.plateau is not None:
                saved = meta.get("trainer", {}).get("plateau")
                if saved:
                    self.plateau.load_state_dict(saved)
                elif _find_hyperparams_state(state.opt_state) is not None:
                    # legacy checkpoint without controller state: at least
                    # keep the restored runtime lr instead of silently
                    # resetting the schedule to init_lr
                    self.plateau.lr = float(np.asarray(
                        _find_hyperparams_state(state.opt_state)
                        .hyperparams["learning_rate"]))
                    logger.warning(
                        "checkpoint has no plateau controller state; resumed "
                        "lr=%g from the optimizer state but best/patience "
                        "counters restart", self.plateau.lr)
            logger.info("resumed from %s at epoch %d", resume, start_epoch)
        self.global_step = int(state.step)
        if resume:
            # subclass hook: rebuild any epoch-dependent side state the
            # checkpoint does not carry (e.g. the SSL trainer's injected
            # pseudo-label set) so a chunked resume trains the same data a
            # monolithic run would at this epoch
            self.on_resume(state, start_epoch)

        self.loggers.log_hyperparams(self.hparams)
        n_params = sum(p.size for p in jax.tree.leaves(state.params))
        logger.info("model parameters: %.2fM", n_params / 1e6)

        for cb in self.callbacks:
            cb.on_fit_start(self, state)
        for epoch in range(start_epoch, self.total_epochs):
            self.epoch = epoch
            for cb in self.callbacks:
                cb.on_train_epoch_start(self, state, epoch)
            state = self._train_epoch(state, epoch)
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                val_metrics = self.validate(state)
                self.loggers.log_metrics(val_metrics, int(state.step))
                self.checkpoints.save(
                    state, epoch, val_metrics, self.hparams,
                    trainer_meta=({"plateau": self.plateau.state_dict()}
                                  if self.plateau is not None else None))
                if self.plateau is not None:
                    new_lr = self.plateau.step(val_metrics.get(self.plateau_monitor))
                    state = self._set_lr(state, new_lr)
                    self.loggers.log_metrics({"lr": new_lr}, int(state.step))
                self.on_validation_end(state, epoch, val_metrics)
                for cb in self.callbacks:
                    cb.on_validation_end(self, state, epoch, val_metrics)
            if self.should_stop:
                logger.info("stopping early at epoch %d", epoch)
                break
        for cb in self.callbacks:
            cb.on_fit_end(self, state)
        print(self.profiler.summary())
        return state

    def _set_lr(self, state: AsrTrainState, lr: float) -> AsrTrainState:
        """Update the learning rate inside an inject_hyperparams opt state."""
        import jax.numpy as jnp

        target = _find_hyperparams_state(state.opt_state)
        if target is None:
            logger.warning("plateau scheduling requires optax.inject_hyperparams; skipping")
            return state
        target.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return state.replace(opt_state=state.opt_state)

    def _pinned_train_step(self, state):
        """Jitted train step with the state OUTPUT shardings pinned to the
        tp placement rules.  Without the pin, GSPMD is free to choose
        different shardings for unannotated outputs (observed: the
        replicated vocab head coming back model-sharded), which breaks the
        AOT executable's second call and silently re-specializes plain jit
        every step on tp meshes."""
        if self._train_step_pinned is None:
            from ..parallel.tp import tp_state_sharding

            out_sh = (tp_state_sharding(state, self.mesh), None)
            self._train_step_pinned = jax.jit(
                self._train_fn, donate_argnums=(0,), out_shardings=out_sh)
        return self._train_step_pinned

    def _run_train_step(self, state, dev_batch, rng):
        """Execute one train step; in multi-process mode, compile new batch
        shapes ahead-of-time and barrier (coordination service) before their
        first execution so every process reaches the collective's context
        init together regardless of compile-time skew."""
        if self._n_procs == 1:
            step = self._pinned_train_step(state) if self._tp > 1 else self._train_step
            with self._tp_scope():
                return step(state, dev_batch, rng)
        key = (dev_batch["waves"].shape, dev_batch["waves"].dtype.name,
               dev_batch["targets"].shape)
        exe = self._aot_train_steps.get(key)
        if exe is None:
            step = self._pinned_train_step(state) if self._tp > 1 else self._train_step
            with self._tp_scope():
                exe = step.lower(state, dev_batch, rng).compile()
            # Name the barrier by the batch-shape key itself — deterministic
            # across processes even if they encounter shapes in different
            # orders (a compile-order-derived name deadlocks silently on any
            # divergence).
            import hashlib

            name = "lasr_step_" + hashlib.md5(repr(key).encode()).hexdigest()[:16]
            logger.info("waiting at barrier %s for batch shape %s", name, key)
            self._coordination_barrier(name)
            self._aot_train_steps[key] = exe
        return exe(state, dev_batch, rng)

    def _coordination_barrier(self, name: str, timeout_ms: int = 3_600_000) -> None:
        """Block until every process reaches `name` — via the coordination
        service (no device collective, so no gloo/ICI context is created and
        no 30 s exchange deadline applies). Best-effort: a runtime without a
        coordination client (single process) is a no-op."""
        try:
            from jax._src import distributed

            client = distributed.global_state.client
        except ImportError:  # pragma: no cover - private API moved
            logger.warning("no coordination barrier available; relying on "
                           "collective-init deadline not being hit")
            return
        if client is None:
            return
        try:
            client.wait_at_barrier(name, timeout_ms)
        except Exception as e:  # timeout / coordination-service failure
            raise RuntimeError(
                f"coordination barrier {name!r} failed on process "
                f"{jax.process_index()}/{self._n_procs} — processes likely "
                f"encountered different batch shapes or one died mid-compile"
            ) from e

    # Hook for subclasses (e.g. the SSL pseudo-labeling trainer).
    def on_validation_end(self, state, epoch, val_metrics) -> None:
        pass

    def on_train_epoch_end(self, state, epoch) -> None:
        pass

    def on_resume(self, state, start_epoch) -> None:
        pass

    def _device_iter(self, batcher, limit: Optional[int] = None):
        """Decode + assemble + host->device transfer in the prefetch thread,
        so transfers overlap device compute (double buffering); yields
        (host_batch, device_batch).  ``limit`` caps the SOURCE iterator (not
        the consumer) so the prefetch worker terminates instead of blocking
        forever on a full queue when an epoch is truncated."""
        def gen():
            it = iter(batcher)
            if limit is not None:
                it = itertools.islice(it, limit)
            for batch in it:
                yield batch, self._device_batch(batch)

        return prefetch(gen(), self.dm.prefetch_depth)

    def _device_cached_iter(self, epoch: int, batcher=None,
                            limit: Optional[int] = None):
        """HBM-resident epochs: epoch 0 stages batches normally while
        recording them; later epochs replay the recorded device arrays in a
        reshuffled order with no host work at all.  A ``limit`` caps what
        epoch 0 records, so every replay epoch trains the same truncated
        subset (Lightning's limit_train_batches contract)."""
        if self._epoch_cache is None:
            cache = []
            if batcher is None:
                batcher = self.dm.train_dataloader(epoch)
            for batch, dev_batch in self._device_iter(batcher, limit):
                cache.append((batch, dev_batch))
                yield batch, dev_batch
            self._epoch_cache = cache
        else:
            order = np.random.default_rng(self.seed + 7919 * epoch).permutation(
                len(self._epoch_cache))
            # group the replay by bucket shape (stable sort keeps the shuffle
            # within each bucket): consecutive steps then reuse one compiled
            # graph — executable switches through the dispatch path are far
            # more expensive than a step itself on the tunneled backend
            order = sorted(order,
                           key=lambda i: self._epoch_cache[i][0].waves.shape[1])
            for i in order:
                yield self._epoch_cache[i]

    def _train_epoch(self, state: AsrTrainState, epoch: int) -> AsrTrainState:
        if self.device_cache and self._epoch_cache is not None:
            batch_iter = self._device_cached_iter(epoch)  # replay: no loader
        else:
            batcher = self.dm.train_dataloader(epoch)
            limit = _resolve_batch_limit(self.limit_train_batches, batcher)
            if self.device_cache:
                batch_iter = self._device_cached_iter(epoch, batcher, limit)
            else:
                batch_iter = self._device_iter(batcher, limit)
        t_epoch = time.monotonic()
        audio_seconds = 0.0
        n_batches = 0
        for i, (batch, dev_batch) in enumerate(batch_iter):
            with self.profiler.profile("train_step"):
                state, metrics = self._run_train_step(state, dev_batch, self.rng)
            audio_seconds += batch.audio_seconds
            n_batches += 1
            # host-side step counter: fetching state.step would force a
            # device sync every step and serialize transfer against compute
            self.global_step += 1
            step = self.global_step

            if step % self.log_every_n_steps == 0:
                with self.profiler.profile("train_logging"):
                    log = {
                        "train_loss": float(metrics["loss"]),
                        "grad_norm": float(metrics["grad_norm"]),
                        "nan_count": float(state.nan_count),
                        "epoch": epoch,
                    }
                    if self.lr_schedule is not None:
                        log["lr"] = float(self.lr_schedule(step - 1))
                    if step % max(self.train_wer_every_n_steps, 1) == 0 and batch.size:
                        hyps = greedy_decode_to_strings(
                            _local_np(metrics["preds"]), _local_np(metrics["pred_lens"]),
                            self.vocab.labels, self.vocab.blank_id)
                        refs = self.wer.decode_reference(
                            batch.targets[: batch.size], batch.target_lens[: batch.size])
                        log["train_wer"] = WER(self.vocab.labels, self.vocab.use_cer).update(
                            hyps[: batch.size], refs)
                    self.loggers.log_metrics(log, step)

            if i % self.sample_log_every_n_batches == 0 and batch.size:
                hyps = greedy_decode_to_strings(
                    _local_np(metrics["preds"]), _local_np(metrics["pred_lens"]),
                    self.vocab.labels, self.vocab.blank_id)
                refs = self.wer.decode_reference(batch.targets, batch.target_lens)
                logger.info("pred: %s", hyps[0])
                logger.info("true: %s", refs[0])
            for cb in self.callbacks:
                cb.on_train_batch_end(self, state, metrics, batch, i)

        # honest epoch wall: force a host fetch so every dispatched step has
        # actually executed (async dispatch otherwise lets the loop race
        # ahead of the device, especially in device_cache mode where no
        # transfer or logging syncs mid-epoch)
        if n_batches:
            int(jax.device_get(state.nan_count))
        dt = time.monotonic() - t_epoch
        self.epoch_stats.append({
            "epoch": epoch, "batches": n_batches, "wall_sec": dt,
            "audio_sec": audio_seconds,
            "audio_sec_per_sec": audio_seconds / max(dt, 1e-9),
        })
        logger.info(
            "epoch %d: %d batches, %.1fs, %.1f audio-sec/sec",
            epoch, n_batches, dt, audio_seconds / max(dt, 1e-9),
        )
        self.on_train_epoch_end(state, epoch)
        for cb in self.callbacks:
            cb.on_train_epoch_end(self, state, epoch)
        return state

    # ------------------------------------------------------------------
    def _eval_loop(self, state: AsrTrainState, batcher, tag: str,
                   limit: Optional[int] = None) -> dict:
        metric = WER(self.vocab.labels, self.vocab.use_cer)
        batch_wers = []
        losses = []
        for i, (batch, dev_batch) in enumerate(self._device_iter(batcher, limit)):
            with self.profiler.profile(f"{tag}_step"), self._tp_scope():
                out = self._eval_step(state, dev_batch)
            n = batch.size
            if n == 0:  # multi-host tail shard with only pad rows
                continue
            losses.extend(_local_np(out["losses"])[:n].tolist())
            hyps = greedy_decode_to_strings(
                _local_np(out["preds"]), _local_np(out["pred_lens"]),
                self.vocab.labels, self.vocab.blank_id)[:n]
            refs = self.wer.decode_reference(batch.targets[:n], batch.target_lens[:n])
            batch_wers.append(metric.update(hyps, refs))
            if i % self.sample_log_every_n_batches == 0:
                logger.info("[%s] pred: %s", tag, hyps[0])
                logger.info("[%s] true: %s", tag, refs[0])
        if self._n_procs > 1:
            # Cross-host metric reduction — the reference's torchmetrics
            # dist_reduce_fx='sum' analog (asr_metrics.py:114-115): sum error
            # counts / words / losses over processes, then normalize.
            from jax.experimental import multihost_utils

            local = np.asarray([metric.scores, metric.words, float(np.sum(losses)),
                                float(len(losses)), float(np.sum(batch_wers)),
                                float(len(batch_wers))], np.float64)
            tot = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
            return {
                f"{tag}_loss": float(tot[2] / tot[3]) if tot[3] else float("inf"),
                f"{tag}_wer": float(tot[4] / tot[5]) if tot[5] else float("inf"),
                f"{tag}_wer_corpus": float(tot[0] / tot[1]) if tot[1] else float("inf"),
            }
        mean_batch_wer = float(np.mean(batch_wers)) if batch_wers else float("inf")
        return {
            f"{tag}_loss": float(np.mean(losses)) if losses else float("inf"),
            # the reference logs the epoch mean of batch WERs (train.py:147-168)
            f"{tag}_wer": mean_batch_wer,
            # corpus-level WER (sum errors / sum words) — the better statistic
            f"{tag}_wer_corpus": metric.compute(),
        }

    def validate(self, state: AsrTrainState) -> dict:
        batcher = self.dm.val_dataloader()
        limit = _resolve_batch_limit(self.limit_val_batches, batcher)
        metrics = self._eval_loop(state, batcher, "val", limit)
        logger.info("validation: %s", metrics)
        return metrics

    def test(self, state: AsrTrainState) -> dict:
        metrics = self._eval_loop(state, self.dm.test_dataloader(), "test")
        logger.info("test: %s", metrics)
        self.loggers.log_metrics(metrics, int(state.step))
        return metrics
