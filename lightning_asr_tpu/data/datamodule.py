"""AsrDataModule — the reference's ``LibriDataModule`` surface
(``/root/reference/data_module.py:177-248``): train/val/test loaders built
from JSONL manifests + labels, with duration filters (train 16.7s / dev 40s)
and train-time shuffle+crop.  Adds pseudo-label injection used by the SSL
path (``ssl_codec/ssl_data_module.py:262-281``)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

from .manifest import ManifestEntry, read_manifests
from .pipeline import BucketBatcher, prefetch
from .vocab import Vocabulary


def _as_list(manifest) -> list:
    if manifest is None:
        return []
    if isinstance(manifest, (str, Path)):
        return [manifest]
    return list(manifest)


class AsrDataModule:
    def __init__(
        self,
        train_manifest=None,
        dev_manifest=None,
        test_manifest=None,
        labels: Union[str, Sequence[str]] = (),
        train_bs: int = 16,
        dev_bs: int = 16,
        train_max_duration: float = 16.7,
        dev_max_duration: float = 40.0,
        seed: int = 0,
        crop: bool = True,
        bucket_seconds: Optional[Sequence[float]] = None,
        prefetch_depth: int = 2,
        pseudo_manifest=None,
        pseudo_max_duration: float = 16.7,
        cache: Optional[str] = None,
        cache_dir: Optional[Union[str, Path]] = None,
        wire: str = "int16",
    ):
        """``cache='ram'`` enables the decode-once waveform cache: every wav
        is decoded a single time (int16, exact for PCM16) and later epochs
        slice crops straight from RAM — the cached-dataset mode for
        steady-state epoch throughput (the dict is owned here because
        batchers are rebuilt per epoch).

        ``cache='mmap'`` is the persistent variant: decoded waveforms live in
        a packed memory-mapped file (``cache_dir``, default
        ``<train manifest dir>/_lasr_wave_cache``), so a fresh process —
        a chunked-resume restart of a long run, or a second training job on
        the same corpus — pays zero decode, and corpora far larger than host
        RAM (960 h is ~110 GB int16) stream through the OS page cache.  See
        ``wave_cache.MmapWaveCache``."""
        if cache not in (None, "ram", "mmap"):
            raise ValueError(f"cache must be None, 'ram' or 'mmap', got {cache!r}")
        self.vocab = Vocabulary.from_config(labels)
        self.train_manifest = _as_list(train_manifest)
        self.dev_manifest = _as_list(dev_manifest)
        self.test_manifest = _as_list(test_manifest)
        self.train_bs = train_bs
        self.dev_bs = dev_bs
        self.train_max_duration = train_max_duration
        self.dev_max_duration = dev_max_duration
        self.seed = seed
        self.crop = crop
        self.bucket_seconds = bucket_seconds
        self.prefetch_depth = prefetch_depth
        # host->device wire format: int16 (exact, default), mulaw8 (8-bit
        # companded, opt-in for transfer-bound links), float32
        self.wire = wire
        self.train_entries: List[ManifestEntry] = []
        self.dev_entries: List[ManifestEntry] = []
        self.test_entries: List[ManifestEntry] = []
        self.pseudo_entries: List[ManifestEntry] = []  # SSL pseudo-labels
        self.pseudo_manifest = _as_list(pseudo_manifest)
        self.pseudo_max_duration = pseudo_max_duration
        self.unlabeled_entries: List[ManifestEntry] = []
        if cache == "mmap":
            from .wave_cache import MmapWaveCache

            if cache_dir is None:
                base = Path(self.train_manifest[0]).parent if self.train_manifest \
                    else Path(".")
                cache_dir = base / "_lasr_wave_cache"
            self._wave_cache = MmapWaveCache(cache_dir)
        else:
            self._wave_cache = {} if cache == "ram" else None
        self._setup_done = False

    def setup(self) -> None:
        if self._setup_done:
            return
        if self.train_manifest:
            self.train_entries = read_manifests(self.train_manifest, self.train_max_duration)
        if self.dev_manifest:
            self.dev_entries = read_manifests(self.dev_manifest, self.dev_max_duration)
        if self.test_manifest:
            self.test_entries = read_manifests(self.test_manifest, self.dev_max_duration)
        if self.pseudo_manifest:
            self.unlabeled_entries = read_manifests(self.pseudo_manifest, self.pseudo_max_duration)
        self._setup_done = True

    @staticmethod
    def _shard_info() -> tuple[int, int, int]:
        """(rank, world, global device count) for multi-host data loading —
        each process assembles only its slice of every global batch (the
        reference's PL DDP sampler analog, ``/root/reference/train.py:251``)."""
        try:
            import jax

            if jax.process_count() > 1:
                return jax.process_index(), jax.process_count(), jax.device_count()
        except Exception:
            pass
        return 0, 1, 1

    def _batcher(self, entries, bs, train) -> BucketBatcher:
        kwargs = {}
        if self.bucket_seconds is not None:
            kwargs["bucket_seconds"] = self.bucket_seconds
        rank, world, n_dev = self._shard_info()
        if world > 1:
            kwargs.update(shard_rank=rank, shard_count=world, pad_to=n_dev)
        return BucketBatcher(
            entries, self.vocab, bs, train=train, crop=self.crop and train,
            seed=self.seed, wave_cache=self._wave_cache,
            wire_dtype=self.wire, **kwargs,
        )

    def train_dataloader(self, epoch: int = 0) -> BucketBatcher:
        self.setup()
        entries = self.train_entries + self.pseudo_entries
        batcher = self._batcher(entries, self.train_bs, train=True)
        batcher.set_epoch(epoch)
        return batcher

    def val_dataloader(self) -> BucketBatcher:
        self.setup()
        return self._batcher(self.dev_entries, self.dev_bs, train=False)

    def test_dataloader(self) -> BucketBatcher:
        self.setup()
        return self._batcher(self.test_entries, self.dev_bs, train=False)

    def steps_per_epoch(self) -> int:
        """The reference sizes its LR cycle by len(train_dataloader)
        (``train.py:53``)."""
        self.setup()
        return len(self._batcher(self.train_entries + self.pseudo_entries, self.train_bs, train=True))

    def pseudo_train_dataloader(self):
        """Iterate the unlabeled pool for pseudo-label generation
        (``ssl_data_module.py:276``)."""
        self.setup()
        return self._batcher(self.unlabeled_entries, self.dev_bs, train=False)

    # -- SSL pseudo-labeling hooks (ssl_data_module.py:262-281) -------------
    def inject_pseudo_datasets(self, pairs: Sequence[tuple]) -> None:
        """pairs of (audio_path, text[, duration]) accepted as new training
        data; replaces previously injected pseudo labels."""
        entries = []
        for pair in pairs:
            path, text = pair[0], pair[1]
            duration = pair[2] if len(pair) > 2 else None
            if duration is None:
                from .audio import duration_seconds

                duration = duration_seconds(path)
            entries.append(ManifestEntry(str(path), float(duration), text))
        self.pseudo_entries = entries

    def iter_prefetched(self, batcher: BucketBatcher):
        return prefetch(iter(batcher), self.prefetch_depth)
