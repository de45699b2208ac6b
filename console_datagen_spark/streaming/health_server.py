"""HTTP health endpoint — binds the reference's ``/q/health`` surface.

The reference serves SmallRye health JSON from Quarkus at ``/q/health``
(+ ``/q/health/live`` and ``/q/health/ready``), returning HTTP 200 when
the overall status is UP and 503 when DOWN
(health/CounterProgressCheck.java:37-130, AdminConnectivityCheck.java:27-54,
Producer/ConsumerProgressCheck.java:27-29). This module serves the same
shape from a stdlib threaded HTTP server: the payload provider is any
zero-arg callable returning the ``render_health_response`` dict, so the
engine's snapshot-diff analytics (streaming/health.py) plug in directly.

Driver-side only — health is a dashboard query over the tiny counter
table, never a data-path operator; one thread and one port suffice at any
scale.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

HEALTH_PATHS = ("/q/health", "/q/health/live", "/q/health/ready")


class HealthServer:
    """Serve SmallRye-shape health JSON on ``/q/health`` (+ live/ready).

    ``provider`` is called per request; it returns the dict produced by
    ``render_health_response``. Status code mirrors Quarkus: 200 for UP,
    503 for DOWN, 404 off the health paths.
    """

    def __init__(
        self,
        provider: Callable[[], dict],
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self._provider = provider
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
                if self.path.rstrip("/") not in HEALTH_PATHS:
                    self.send_error(404)
                    return
                try:
                    payload = outer._provider()
                except Exception as ex:  # a failing check IS a DOWN report
                    payload = {
                        "status": "DOWN",
                        "checks": [
                            {"name": "provider", "status": "DOWN",
                             "data": {"error": str(ex)}}
                        ],
                    }
                body = json.dumps(payload).encode()
                code = 200 if payload.get("status") == "UP" else 503
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args) -> None:  # keep test output quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address[:2]

    def start(self) -> tuple[str, int]:
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="health-server", daemon=True
        )
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
