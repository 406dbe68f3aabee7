"""HTTP transcription server — the reference's Flask app
(``/root/reference/server/app.py``): model loaded once at startup,
``POST /`` with a multipart form file field ``audio`` returns the
transcription.

Uses Flask when installed; otherwise falls back to a stdlib
``http.server`` implementation with identical request/response semantics,
so the server works in dependency-free environments.

Beyond the reference (which serves one request at a time): a dynamic
batcher — concurrent requests are collected for up to ``max_wait_ms`` or
``max_batch`` and transcribed as ONE device batch, so serving throughput
scales with TPU batch efficiency instead of request latency.
"""

from __future__ import annotations

import io
import logging
import queue
import re
import threading
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np

from ..data.audio import read_audio
from .predict import AsrTranslator

logger = logging.getLogger(__name__)


class DynamicBatcher:
    """Collect concurrent transcription requests into device batches."""

    def __init__(self, translator: AsrTranslator, max_batch: int = 8,
                 max_wait_ms: float = 20.0):
        self.translator = translator
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._queue: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def translate(self, audio) -> str:
        samples, sr = read_audio(audio, mono=True)
        if sr != self.translator.frontend.sample_rate:
            raise ValueError(
                f"expected {self.translator.frontend.sample_rate} Hz audio, got {sr}")
        fut: "Future[str]" = Future()
        self._queue.put((samples[0], fut))
        return fut.result()

    def _run(self) -> None:
        while True:
            wave, fut = self._queue.get()
            batch: List = [(wave, fut)]
            deadline = None
            while len(batch) < self.max_batch:
                import time as _time

                if deadline is None:
                    deadline = _time.monotonic() + self.max_wait
                timeout = deadline - _time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            try:
                texts = self.translator.transcribe_batch([w for w, _ in batch])
                for (_, f), text in zip(batch, texts):
                    f.set_result(text if isinstance(text, str) else text[0])
            except Exception as e:  # pragma: no cover
                for _, f in batch:
                    f.set_exception(e)


def _parse_multipart_file(body: bytes, content_type: str, field: str = "audio") -> Optional[bytes]:
    """Minimal multipart/form-data parser for one file field."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        return None
    boundary = b"--" + m.group(1).encode()
    for part in body.split(boundary):
        if b"Content-Disposition" not in part:
            continue
        header_end = part.find(b"\r\n\r\n")
        if header_end < 0:
            continue
        headers = part[:header_end].decode("utf-8", "replace")
        if f'name="{field}"' not in headers:
            continue
        payload = part[header_end + 4 :]
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        return payload
    return None


def create_flask_app(translator: AsrTranslator):
    from flask import Flask, request  # type: ignore

    app = Flask(__name__)

    @app.route("/", methods=["POST"])
    def transcribe():  # pragma: no cover - exercised via stdlib path in tests
        file = request.files["audio"]
        data = io.BytesIO()
        file.save(data)
        return translator.translate(data)

    return app


def serve(
    model_path: str,
    host: str = "0.0.0.0",
    port: int = 5000,
    translator: Optional[AsrTranslator] = None,
    use_flask: Optional[bool] = None,
    batching: bool = False,
    max_batch: int = 8,
    max_wait_ms: float = 20.0,
    warmup_seconds: Optional[Sequence[float]] = None,
):
    """Start the server (blocking).

    ``batching``/``warmup_seconds`` use the stdlib server (the Flask app,
    like the reference's, serves requests independently)."""
    translator = translator or AsrTranslator(model_path)
    if use_flask is None and not batching and not warmup_seconds:
        try:
            import flask  # noqa: F401

            use_flask = True
        except ImportError:
            use_flask = False

    if use_flask:  # pragma: no cover
        create_flask_app(translator).run(host=host, port=port)
        return

    make_stdlib_server(
        translator, host, port, batching=batching, max_batch=max_batch,
        max_wait_ms=max_wait_ms, warmup_seconds=warmup_seconds,
    ).serve_forever()


def make_stdlib_server(translator, host: str = "127.0.0.1", port: int = 0,
                       batching: bool = False, max_batch: int = 8,
                       max_wait_ms: float = 20.0,
                       warmup_seconds: Optional[Sequence[float]] = None):
    """stdlib HTTP server exposing the same POST / contract (testable).
    ``batching=True`` wraps the translator in a DynamicBatcher so concurrent
    requests share device batches.  ``warmup_seconds`` pre-compiles the
    (batch, bucket) executable ladder for those request durations at
    startup — without it a cold server answers its first concurrent burst
    at XLA-compile latency (20-40 s/shape on the tunneled backend), not
    step latency."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if warmup_seconds:
        translator.warmup(warmup_seconds, max_batch if batching else 1)
    if batching:
        translator = DynamicBatcher(translator, max_batch, max_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                payload = _parse_multipart_file(
                    body, self.headers.get("Content-Type", ""), "audio"
                )
                if payload is None:
                    self.send_error(400, "missing form file field 'audio'")
                    return
                text = translator.translate(io.BytesIO(payload))
                data = text.encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:  # pragma: no cover
                logger.exception("transcription failed")
                self.send_error(500, str(e))

        def log_message(self, fmt, *args):
            logger.info("server: " + fmt, *args)

    return ThreadingHTTPServer((host, port), Handler)


def _main() -> None:
    """``python -m lightning_asr_tpu.inference.server`` — the reference
    runs its Flask app the same way (``/root/reference/server/app.py``);
    ours adds dynamic batching + compile-ladder warmup flags."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    help="checkpoint dir (as written by CheckpointManager)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--batching", action="store_true",
                    help="collect concurrent requests into device batches")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--warmup-seconds", type=float, nargs="*", default=None,
                    help="pre-compile the (batch, bucket) ladder for these "
                         "request durations at startup (a cold server "
                         "otherwise answers its first burst at XLA-compile "
                         "latency)")
    ap.add_argument("--flask", action="store_true", default=None,
                    help="force the Flask app (default: auto when installed "
                         "and no batching/warmup requested)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    serve(args.model, host=args.host, port=args.port, use_flask=args.flask,
          batching=args.batching, max_batch=args.max_batch,
          max_wait_ms=args.max_wait_ms, warmup_seconds=args.warmup_seconds)


if __name__ == "__main__":
    _main()
