"""HTTP control listener — the warp analog (src/Service.hs:28-83).

The reference serves its control API on :8081 while workers crawl; this
module serves the same six endpoints over `service.py`'s verbs from a
daemon thread next to the driver loop:

  GET  /status                 → {"status": ..., "round": ..., ...}
  GET  /workerStatus           → [String] (executor/task view — the
                                 Spark analog of thread states)
  GET  /queueSize/UrlQueue     → int (pending frontier rows)
  GET  /queueSize/StoreQueue   → 0 (round-synchronous engine: no
  GET  /queueSize/ErrorQueue     in-flight buffers at a round boundary;
                                 the reference reports its STM queues)
  POST /addUrl                 (JSON string body) → null, or 400
                                 "Could not understand url: ..." exactly
                                 like Service.hs:70-74
  POST /addUrlIncludePattern   (JSON string body) → null
  POST /stop                   → null (halting-status flag; the round
                                 loop exits at the next boundary)

Liveness parity with the reference's readTVarIO-backed endpoints (they
answer immediately while workers crawl): status and queueSize serve from
the driver-held boundary snapshot (`CrawlRun.control_snapshot`), never
the round-long `control_lock`; addUrl / addUrlIncludePattern buffer into
driver lists drained at the next round boundary inside the lock — an
admission still never interleaves with a round's staged commits, but the
listener replies in microseconds even mid-round.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from crawler_spark import service
from crawler_spark.driver import CrawlRun


def worker_status_strings(run: CrawlRun) -> list[str]:
    """GET /workerStatus returns [String] in the reference (one line per
    worker thread's ThreadStatus); render the executor/task view the
    same shape."""
    ws = service.worker_status(run, run.spark)
    lines = [
        f"parallelism={ws['parallelism']}",
        f"rounds_run={ws['rounds_run']}",
        f"stored_total={ws['stored_total']}",
        f"active_jobs={ws['active_jobs']}",
        f"active_stages={ws['active_stages']}",
    ]
    lines += [f"timing {k}={v}" for k, v in sorted(ws["last_round_timings"].items())]
    return lines


class ControlServer:
    """Owns the ThreadingHTTPServer + its daemon thread; `port` is bound
    eagerly (pass 0 for an ephemeral port — tests; the reference pins
    8081)."""

    def __init__(self, run: CrawlRun, host: str = "127.0.0.1", port: int = 8081):
        self.run = run
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload, raw: bytes | None = None):
                body = raw if raw is not None else json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                r = outer.run
                if self.path == "/status":
                    s = r.control_snapshot()
                    self._reply(
                        200, {k: s[k] for k in ("status", "round", "stored_total")}
                    )
                elif self.path == "/workerStatus":
                    self._reply(200, worker_status_strings(r))
                elif self.path.startswith("/queueSize/"):
                    name = self.path.rsplit("/", 1)[1]
                    if name == "UrlQueue":
                        self._reply(200, r.control_snapshot()["queue_size"])
                    elif name in ("StoreQueue", "ErrorQueue"):
                        self._reply(200, 0)
                    else:
                        self._reply(400, {"error": f"unknown queue: {name}"})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                r = outer.run
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    body = json.loads(self.rfile.read(n) or b"null")
                except json.JSONDecodeError:
                    return self._reply(400, {"error": "invalid JSON body"})
                if self.path == "/addUrl":
                    if not isinstance(body, str):
                        return self._reply(400, {"error": "expected a JSON string"})
                    if not _would_canonicalize(body):
                        # Service.hs:70-72 err400 body, verbatim prefix —
                        # the canonicalize check is the reference's only
                        # 400 path, and it's pure Python (no lock, no job)
                        return self._reply(
                            400, None, raw=f"Could not understand url: {body}".encode()
                        )
                    r.enqueue_add_url(body)
                    self._reply(200, None)
                elif self.path == "/addUrlIncludePattern":
                    if not isinstance(body, str):
                        return self._reply(400, {"error": "expected a JSON string"})
                    r.enqueue_include_pattern(body)
                    self._reply(200, None)
                elif self.path == "/stop":
                    service.request_stop(r)
                    self._reply(200, None)
                else:
                    self._reply(404, {"error": "not found"})

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self) -> "ControlServer":
        self.thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()


def _would_canonicalize(raw: str) -> bool:
    from crawler_spark.functions.urls import canonicalize

    url, _host, err = canonicalize(raw.strip())
    return err is None and url is not None
