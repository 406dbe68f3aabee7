#!/usr/bin/env python
"""Hello-world HTTP smoke check (parity with the reference's
``scripts/flask_test.py:1-12``): verifies the serving stack is importable
and can answer a request before wiring the real ASR server.

Uses Flask when installed, else the same stdlib fallback the production
server uses (``lightning_asr_tpu/inference/server.py``).
"""

PORT = 8002


def main() -> None:
    try:
        from flask import Flask

        app = Flask(__name__)

        @app.route("/")
        def hello():  # pragma: no cover - trivial
            return "hello from lightning-asr-tpu"

        app.run(port=PORT, debug=True)
    except ImportError:
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class Hello(BaseHTTPRequestHandler):
            def do_GET(self):
                body = b"hello from lightning-asr-tpu (stdlib)"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        print(f"serving on http://127.0.0.1:{PORT} (no flask; stdlib fallback)")
        HTTPServer(("127.0.0.1", PORT), Hello).serve_forever()


if __name__ == "__main__":
    main()
