"""HTTP observability API (reference lib/HttpServer.js:34-89) — a thin
stdlib wrapper over the engine's status/DSL/discovery state. Peripheral
by design (SURVEY S9): the data plane never depends on it.

Routes (reference parity):
  GET /              -> {name, version}
  GET /healthcheck   -> 200 "OK"
  GET /status        -> counters + stored-event count
  GET /dsl           -> the active DSL config
  GET /dsl/topics    -> configured topic list
  GET /discovery/topics  -> discovered topics
  GET /discovery/fields  -> discovered field hashes per topic
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def serve(sarkac, host: str = "127.0.0.1", port: int = 8033):
    """Start the observability server on a daemon thread; returns the
    HTTPServer (call ``.shutdown()`` to stop)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # silence per-request stderr noise
            pass

        def _send(self, payload, code: int = 200, raw: bool = False) -> None:
            body = payload if raw else json.dumps(payload).encode()
            if isinstance(body, str):
                body = body.encode()
            self.send_response(code)
            self.send_header(
                "Content-Type", "text/plain" if raw else "application/json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            if self.path == "/":
                from sarkac_spark import __version__

                self._send({"name": "sarkac_spark", "version": __version__})
            elif self.path == "/healthcheck":
                self._send("OK", raw=True)
            elif self.path == "/status":
                self._send(sarkac.get_status())
            elif self.path == "/dsl":
                self._send(
                    {
                        t.topic: {
                            f.path: {"windows": list(f.windows)} for f in t.fields
                        }
                        for t in sarkac.dsl.topics.values()
                    }
                )
            elif self.path == "/dsl/topics":
                self._send(sarkac.dsl.kafka_topics())
            elif self.path == "/discovery/topics":
                self._send(sarkac.discovery.known_topics)
            elif self.path == "/discovery/fields":
                self._send(sarkac.discovery.field_hashes)
            else:
                self._send({"error": "not found"}, code=404)

    server = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
