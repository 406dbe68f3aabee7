#!/usr/bin/env python
"""Diagnose the batched-mode c32 collapse: instrument DynamicBatcher's two
stages (batch size, decode ms, device ms, ready-queue handoff wait) per
level and print histograms, reproducing SERVING_BENCH's level sequence on
one server instance (c1 -> c8 -> c32 -> c64 -> c32)."""

from __future__ import annotations

import sys
import tempfile
import threading
import time
from collections import Counter
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.bench_serving import make_checkpoint, multipart_wav, run_level  # noqa: E402


def main() -> None:
    from lightning_asr_tpu.data.audio import write_wav
    from lightning_asr_tpu.inference import AsrTranslator
    from lightning_asr_tpu.inference import server as srv
    from lightning_asr_tpu.utils import enable_compile_cache

    enable_compile_cache()
    tmp = Path(tempfile.mkdtemp(prefix="serve_probe_"))
    ckpt = make_checkpoint(tmp / "ckpt")
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(int(5.0 * 16000)) * 0.1).astype(np.float32)
    wav_path = tmp / "req.wav"
    write_wav(wav_path, wave[None], 16000)
    body, boundary = multipart_wav(wav_path.read_bytes())

    events: list = []  # (t, kind, payload)
    lock = threading.Lock()

    def rec(kind, payload):
        with lock:
            events.append((time.perf_counter(), kind, payload))

    orig_assemble = srv.DynamicBatcher._assemble
    orig_device = srv.DynamicBatcher._device_loop

    def patched_assemble(self):
        while True:
            item = self._queue.get()
            t_first = time.perf_counter()
            batch = [item]
            deadline = t_first + self.max_wait
            while len(batch) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    import queue as _q

                    batch.append(self._queue.get(timeout=timeout))
                except Exception:
                    break
            t_got = time.perf_counter()
            decoded = self._decode([b for b, _ in batch])
            t_dec = time.perf_counter()
            good = [(w, f) for w, (_, f) in zip(decoded, batch)
                    if not isinstance(w, Exception)]
            for w, (_, f) in zip(decoded, batch):
                if isinstance(w, Exception):
                    f.set_exception(w)
            if good:
                self._ready.put(good)
            t_put = time.perf_counter()
            rec("assemble", {"bs": len(batch),
                             "collect_ms": (t_got - t_first) * 1e3,
                             "decode_ms": (t_dec - t_got) * 1e3,
                             "handoff_wait_ms": (t_put - t_dec) * 1e3,
                             "qsize_after": self._queue.qsize()})

    def patched_device(self):
        while True:
            good = self._ready.get()
            t0 = time.perf_counter()
            try:
                texts = self.translator.transcribe_batch([w for w, _ in good])
                for (_, f), text in zip(good, texts):
                    f.set_result(text if isinstance(text, str) else text[0])
            except Exception as e:
                for _, f in good:
                    f.set_exception(e)
            rec("device", {"bs": len(good),
                           "device_ms": (time.perf_counter() - t0) * 1e3})

    srv.DynamicBatcher._assemble = patched_assemble
    srv.DynamicBatcher._device_loop = patched_device

    translator = AsrTranslator(ckpt)
    server = srv.make_stdlib_server(translator, "127.0.0.1", 0,
                                    batching=True, max_batch=16,
                                    max_wait_ms=10.0, warmup_seconds=(5.0,))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    for concurrency in (1, 8, 32, 64, 32):
        with lock:
            events.clear()
        n_req = max(64, 4 * concurrency)
        level = run_level(port, body, boundary, concurrency, n_req, 5.0)
        with lock:
            evs = list(events)
        asm = [p for _, k, p in evs if k == "assemble"]
        dev = [p for _, k, p in evs if k == "device"]
        hist = Counter(p["bs"] for p in asm)
        print(f"\n=== c{concurrency}: {level}")
        print(f"  batch-size hist (assemble, incl. warm burst): "
              f"{dict(sorted(hist.items()))}")
        if asm:
            for key in ("collect_ms", "decode_ms", "handoff_wait_ms"):
                v = np.array([p[key] for p in asm])
                print(f"  {key}: p50 {np.percentile(v, 50):.1f} "
                      f"p95 {np.percentile(v, 95):.1f} max {v.max():.1f}")
            q = np.array([p["qsize_after"] for p in asm])
            print(f"  qsize_after: p50 {np.percentile(q, 50):.0f} "
                  f"max {q.max()}")
        if dev:
            v = np.array([p["device_ms"] for p in dev])
            bs = np.array([p["bs"] for p in dev])
            for b in sorted(set(bs.tolist())):
                sel = v[bs == b]
                print(f"  device_ms bs={b}: n={len(sel)} "
                      f"p50 {np.percentile(sel, 50):.1f} max {sel.max():.1f}")
        sys.stdout.flush()
    server.shutdown()

    srv.DynamicBatcher._assemble = orig_assemble
    srv.DynamicBatcher._device_loop = orig_device


if __name__ == "__main__":
    main()
