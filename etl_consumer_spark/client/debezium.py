"""X1/X2 — Debezium Connect REST pause/resume client.

Reference: ``PUT http://{addr}:{port}/connectors/{name}/{action}`` expecting
HTTP 202 (client/debezium.go:23-43), invoked around DDL application
(main.go:418-421, 120), with infinite 1 s-backoff retry on resume
(E6, main.go:426-433). Driver-side (never inside a task): connector
control is a control-plane call, one per DDL batch, not per row.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request


class DebeziumAPI:
    def __init__(self, addr: str, port: str, connector: str, opener=None):
        self.addr = addr
        self.port = port
        self.connector = connector
        # injectable for tests (mock transport)
        self._open = opener or urllib.request.urlopen

    def call(self, action: str) -> None:
        """PUT the action; non-202 raises (reference returns error on
        anything but 202)."""
        url = f"http://{self.addr}:{self.port}/connectors/{self.connector}/{action}"
        req = urllib.request.Request(url, method="PUT", headers={"Content-Type": "application/json"})
        try:
            with self._open(req, timeout=10) as resp:
                status = resp.status
                body = resp.read()
        except urllib.error.HTTPError as exc:  # HTTP error counts as a response
            status = exc.code
            body = exc.read()
        if status != 202:
            raise RuntimeError(f"failed for this request with response: {body!r} (status {status})")

    def pause(self) -> None:
        """X1 — before applying DDL (reference main.go:418)."""
        self.call("pause")

    def resume(self, max_attempts: int | None = None, backoff_s: float = 1.0) -> None:
        """X2/E6 — after DDL; retries with 1 s backoff. ``max_attempts=None``
        reproduces the reference's infinite recursion (main.go:426-433);
        tests pass a bound."""
        attempt = 0
        while True:
            attempt += 1
            try:
                self.call("resume")
                return
            except Exception:
                if max_attempts is not None and attempt >= max_attempts:
                    raise
                time.sleep(backoff_s)
