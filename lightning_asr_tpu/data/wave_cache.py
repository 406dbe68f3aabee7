"""Persistent decode-once waveform cache (``cache='mmap'``).

The RAM cache (``AsrDataModule(cache='ram')``) removes disk decode from the
steady-state epoch loop but (a) dies with the process — every chunked-resume
restart of a long run re-decodes the whole corpus — and (b) cannot hold a
real 960 h corpus (~110 GB of int16 PCM) in a 1-process heap next to the
training state.  This cache keeps the same decode-once semantics in a packed
on-disk file instead:

  * waveforms are appended to ``<dir>/waves.bin`` as raw little-endian int16
    (exact for 16-bit PCM — the wire format the device frontend rescales,
    matching the reference's sox-prepared 16-bit corpora,
    ``/root/reference/scripts/get_libri.py:115``);
  * each append writes one JSON line to ``<dir>/index.jsonl``
    (``{"p": path, "o": sample_offset, "n": samples}``) AFTER the samples
    are flushed, so an interrupted build is crash-safe: on reopen, index
    lines beyond the bin length are dropped and missing utterances are
    simply decoded again (append resumes);
  * readers ``np.memmap`` the bin — a fresh process pays zero decode, the
    OS page cache is shared across processes, and resident memory stays
    bounded by actual access, which is what makes cached mode feasible at
    corpus scales far beyond host RAM.

The class implements the same mapping protocol the batcher's RAM-cache dict
uses (``in`` / ``[]`` / ``[]=``; see ``BucketBatcher._decode_chunk_cached``),
so it drops in wherever the dict did.  Single writer, any number of readers
(the datamodule owns one instance per process; multi-host processes should
point at per-process dirs or pre-build the cache once).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


class MmapWaveCache:
    """Mapping path -> int16 waveform, backed by a packed memory-mapped file.

    Staleness: each index line records the source file's size and mtime at
    decode time; a lookup whose source no longer matches (regenerated /
    replaced wav) is treated as a miss and re-decoded — the new samples are
    appended and the index entry replaced (the old samples become orphaned
    dead space, which is cheap relative to silently serving stale audio).
    Entries written by older versions carry no source metadata and are
    trusted as-is, so existing caches stay valid.

    Concurrency: the first append takes an exclusive ``flock`` on
    ``<dir>/writer.lock``; a second writer process (e.g. ``num_nodes>1``
    pointed at one shared cache dir) fails fast with a clear error instead
    of interleaving appends and shift-corrupting the index.  Readers need
    no lock.
    """

    def __init__(self, directory: str | Path):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.bin_path = self.dir / "waves.bin"
        self.index_path = self.dir / "index.jsonl"
        self._index: dict[str, tuple[int, int]] = {}
        self._src_meta: dict[str, tuple[int, int]] = {}  # path -> (size, mtime_ns)
        self._validated: set[str] = set()  # staleness-checked once per process
        self._mm: np.memmap | None = None
        self._mm_samples = 0  # samples visible through the current memmap
        self._write_f = None  # lazily opened append handle
        self._lock_f = None
        self._load_index()

    # ------------------------------------------------------------------
    def _load_index(self) -> None:
        bin_samples = (self.bin_path.stat().st_size // 2
                       if self.bin_path.exists() else 0)
        self._end = 0  # next free sample offset
        if not self.index_path.exists():
            if bin_samples:
                # index lost entirely: orphaned samples are unreachable;
                # start a fresh bin rather than appending to an unindexed blob
                self.bin_path.unlink()
            return
        kept: list[str] = []
        with open(self.index_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    off, n = int(rec["o"]), int(rec["n"])
                except (json.JSONDecodeError, KeyError, ValueError):
                    break  # torn tail line from a crash mid-append
                if off + n > bin_samples:
                    break  # index line for samples that never hit the disk
                self._index[rec["p"]] = (off, n)
                if "s" in rec and "m" in rec:
                    self._src_meta[rec["p"]] = (int(rec["s"]), int(rec["m"]))
                self._end = max(self._end, off + n)
                kept.append(line)
        if len(kept) != sum(1 for _ in open(self.index_path)):
            # rewrite the index without the torn/overrun tail so the next
            # appends stay consistent
            tmp = self.index_path.with_suffix(".jsonl.tmp")
            tmp.write_text("".join(line + "\n" for line in kept))
            os.replace(tmp, self.index_path)
        if bin_samples > self._end:
            # orphaned tail: samples flushed whose index line never landed
            # (crash inside __setitem__).  Appends write at the PHYSICAL end
            # of the file while the index records self._end, so an
            # unreconciled tail would shift-corrupt every later entry —
            # truncate to the last indexed sample before appending resumes.
            with open(self.bin_path, "r+b") as f:
                f.truncate(self._end * 2)

    def _map(self) -> np.memmap:
        if self._mm is None or self._mm_samples < self._end:
            if self._write_f is not None:
                self._write_f.flush()
            self._mm = np.memmap(self.bin_path, dtype=np.int16, mode="r")
            self._mm_samples = self._mm.shape[0]
        return self._mm

    # ------------------------------------------------------------------
    @staticmethod
    def _stat_src(path: str) -> tuple[int, int] | None:
        try:
            st = os.stat(path)
        except OSError:
            return None
        return (int(st.st_size), int(st.st_mtime_ns))

    def _is_fresh(self, path: str) -> bool:
        """One stat per path per process: entries whose recorded source
        size/mtime no longer match are stale misses (re-decoded + replaced);
        legacy entries without metadata are trusted."""
        if path in self._validated:
            return True
        meta = self._src_meta.get(path)
        if meta is not None and self._stat_src(path) != meta:
            del self._index[path]
            del self._src_meta[path]
            return False
        self._validated.add(path)
        return True

    def __contains__(self, path: str) -> bool:
        return path in self._index and self._is_fresh(path)

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, path: str) -> np.ndarray:
        if path not in self:  # staleness check on direct lookups too
            raise KeyError(path)
        off, n = self._index[path]
        return self._map()[off : off + n]

    def _acquire_writer_lock(self) -> None:
        import fcntl

        self._lock_f = open(self.dir / "writer.lock", "w")
        try:
            fcntl.flock(self._lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            self._lock_f.close()
            self._lock_f = None
            raise RuntimeError(
                f"another process is already writing to the wave cache at "
                f"{self.dir} — point each writer (e.g. each num_nodes>1 "
                f"process) at its own cache_dir, or pre-build the cache once "
                f"before launching") from None

    def __setitem__(self, path: str, wave: np.ndarray) -> None:
        if path in self._index and self._is_fresh(path):
            return  # decode-once: duplicates of a fresh entry are identical
        if np.asarray(wave).dtype != np.int16:
            raise TypeError(
                f"MmapWaveCache stores int16 PCM, got {np.asarray(wave).dtype} "
                f"for {path}")
        wave = np.ascontiguousarray(wave, dtype=np.int16)
        if self._write_f is None:
            self._acquire_writer_lock()
            self._write_f = open(self.bin_path, "ab")
        self._write_f.write(wave.tobytes())
        self._write_f.flush()
        rec = {"p": path, "o": self._end, "n": int(wave.size)}
        src = self._stat_src(path)
        if src is not None:
            rec["s"], rec["m"] = src
            self._src_meta[path] = src
        with open(self.index_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._index[path] = (self._end, int(wave.size))
        self._validated.add(path)
        self._end += int(wave.size)

    def close(self) -> None:
        if self._write_f is not None:
            self._write_f.close()
            self._write_f = None
        if self._lock_f is not None:
            self._lock_f.close()  # releases the flock
            self._lock_f = None
        self._mm = None
