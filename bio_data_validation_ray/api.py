"""HTTP service surface: submit / poll / fetch validation runs.

The reference exposes its validator behind FastAPI
(``/root/reference/src/api/routes.py``): ``POST /api/v1/validate`` returns
a validation_id and runs in the background (:298-325), ``GET
/api/v1/validate/{id}`` polls status + report (:328-351), ``GET
/api/v1/reports[/{file}]`` lists/serves saved reports (:353-392), plus
``/`` ``/health`` ``/metrics`` (:256-295). This module re-expresses that
surface on the Python stdlib (``http.server`` — no FastAPI/aiohttp in
this environment, and a control-plane endpoint needs no ASGI stack): the
data plane stays the Ray pipeline; the server only ever handles tiny JSON
control messages, so a threaded stdlib server is the right weight.

Run via ``python -m bio_data_validation_ray.cli serve --port 8099`` (the
CLI owns the Ray session, per the repo rule) or embed ``ValidationServer``
in tests. Validations execute on ONE background worker thread —
validate_dir already parallelizes across the cluster, so concurrent runs
would fight for the same CPUs (the reference serializes through its
orchestrator the same way)."""

from __future__ import annotations

import json
import os
import queue
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PENDING, RUNNING, COMPLETED, FAILED, CANCELLED = (
    "pending", "running", "completed", "failed", "cancelled")

_ID_RE = re.compile(r"^[0-9a-f]{32}$")


class ValidationServer:
    """State + worker behind the HTTP handler. One instance per server."""

    def __init__(self, reports_dir: str, max_tasks: int = 10_000):
        self.reports_dir = reports_dir
        os.makedirs(reports_dir, exist_ok=True)
        self.tasks: dict[str, dict] = {}
        self.max_tasks = max_tasks
        self._lock = threading.Lock()
        self._q: queue.Queue = queue.Queue()
        self._worker = threading.Thread(target=self._run_loop, daemon=True)
        self._worker.start()

    def _evict_terminal_locked(self) -> None:
        """Bound the registry: beyond ``max_tasks``, drop the OLDEST
        terminal (completed/failed/cancelled) entries — their reports stay
        on disk under reports_dir; only the in-memory status record goes.
        Pending/running tasks are never evicted. Caller holds the lock."""
        if len(self.tasks) < self.max_tasks:
            return
        terminal = sorted(
            (vid for vid, t in self.tasks.items()
             if t["status"] in (COMPLETED, FAILED, CANCELLED)),
            key=lambda v: self.tasks[v].get("submitted_at", 0.0))
        for vid in terminal[: max(1, len(self.tasks) - self.max_tasks + 1)]:
            del self.tasks[vid]

    # ---- task lifecycle ----
    def submit(self, req) -> dict:
        if not isinstance(req, dict):
            raise ValueError(
                f"request body must be a JSON object, got {type(req).__name__}")
        input_dir = req.get("input_dir")
        if not input_dir or not os.path.isdir(input_dir):
            raise ValueError(f"input_dir missing or not a directory: "
                             f"{input_dir!r}")
        vid = uuid.uuid4().hex
        with self._lock:
            self._evict_terminal_locked()
            self.tasks[vid] = {
                "status": PENDING,
                "submitted_at": time.time(),
                "request": {k: req.get(k) for k in
                            ("input_dir", "run_dir", "policy", "strict")},
            }
        self._q.put(vid)
        return {"validation_id": vid, "status": PENDING}

    def status(self, vid: str) -> dict | None:
        with self._lock:
            t = self.tasks.get(vid)
            return dict(t) if t is not None else None

    def cancel(self, vid: str) -> str | None:
        """Cancel a PENDING task (the reference rejects cancelling anything
        already running, routes.py:485-494). Returns the new status, or
        None when unknown."""
        with self._lock:
            t = self.tasks.get(vid)
            if t is None:
                return None
            if t["status"] != PENDING:
                return t["status"]
            t["status"] = CANCELLED
            return CANCELLED

    def _run_loop(self) -> None:
        while True:
            vid = self._q.get()
            if vid is None:  # shutdown sentinel
                return
            with self._lock:
                t = self.tasks.get(vid)
                if t is None or t["status"] != PENDING:
                    continue
                t["status"] = RUNNING
                t["current_stage"] = "validate"
                req = dict(t["request"])
            try:
                from .pipelines.validate import validate_dir

                run_dir = req.get("run_dir") or os.path.join(
                    self.reports_dir, f"run_{vid}")
                report = validate_dir(
                    req["input_dir"], run_dir=run_dir,
                    policy=req.get("policy"),
                    strict=bool(req.get("strict")),
                )
                fname = f"validation_{vid}.json"
                fpath = os.path.join(self.reports_dir, fname)
                tmp = fpath + f".tmp{os.getpid()}"
                with open(tmp, "w") as fh:
                    json.dump(report, fh, indent=1, default=str)
                os.replace(tmp, fpath)
                with self._lock:
                    t = self.tasks[vid]
                    t["status"] = COMPLETED
                    t["completed_at"] = time.time()
                    t["report_file"] = fname
                    t["final_decision"] = report.get("final_decision")
            except Exception as ex:  # noqa: BLE001 — surface via status
                with self._lock:
                    t = self.tasks[vid]
                    t["status"] = FAILED
                    t["error"] = str(ex)

    # ---- report store ----
    def list_reports(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.reports_dir)):
            if name.startswith("validation_") and name.endswith(".json"):
                p = os.path.join(self.reports_dir, name)
                out.append({"filename": name,
                            "size_bytes": os.path.getsize(p),
                            "modified_at": os.path.getmtime(p)})
        return out

    def report_bytes(self, filename: str) -> bytes | None:
        # traversal guard: serve only flat validation_*.json names
        if (os.sep in filename or "/" in filename or ".." in filename
                or not filename.startswith("validation_")
                or not filename.endswith(".json")):
            return None
        p = os.path.join(self.reports_dir, filename)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as fh:
            return fh.read()

    def metrics_text(self) -> str:
        """Prometheus text exposition of the task registry — the analog of
        the reference's /metrics (routes.py:286-295)."""
        with self._lock:
            by_status: dict[str, int] = {}
            for t in self.tasks.values():
                by_status[t["status"]] = by_status.get(t["status"], 0) + 1
        lines = ["# TYPE bdvr_validations_total counter"]
        for s in (PENDING, RUNNING, COMPLETED, FAILED, CANCELLED):
            lines.append(
                f'bdvr_validations_total{{status="{s}"}} '
                f"{by_status.get(s, 0)}")
        lines.append("# TYPE bdvr_reports_saved gauge")
        lines.append(f"bdvr_reports_saved {len(self.list_reports())}")
        return "\n".join(lines) + "\n"

    def close(self) -> None:
        self._q.put(None)


def _make_handler(server: ValidationServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # silent by default
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            path = self.path.split("?")[0].rstrip("/") or "/"
            if path == "/":
                self._json(200, {
                    "service": "bio_data_validation_ray API",
                    "health": "/health", "metrics": "/metrics"})
            elif path == "/health":
                self._json(200, {"status": "healthy", "components": {
                    "api": "healthy", "worker": "healthy"}})
            elif path == "/metrics":
                body = server.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif path == "/api/v1/reports":
                self._json(200, {"reports": server.list_reports()})
            elif path.startswith("/api/v1/reports/"):
                body = server.report_bytes(path.rsplit("/", 1)[1])
                if body is None:
                    self._json(404, {"detail": "Report file not found"})
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
            elif path.startswith("/api/v1/validate/"):
                vid = path.rsplit("/", 1)[1]
                st = server.status(vid) if _ID_RE.match(vid) else None
                if st is None:
                    self._json(404, {"detail": "Validation not found"})
                else:
                    st.pop("request", None)
                    self._json(200, {"validation_id": vid, **st})
            else:
                self._json(404, {"detail": "Not found"})

        def do_POST(self):  # noqa: N802
            path = self.path.split("?")[0].rstrip("/")
            if path != "/api/v1/validate":
                self._json(404, {"detail": "Not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                self._json(200, server.submit(req))
            except (ValueError, json.JSONDecodeError) as ex:
                self._json(400, {"detail": str(ex)})
            except Exception as ex:  # noqa: BLE001 — a bad request must
                # get an HTTP error, never a dropped connection
                self._json(500, {"detail": f"internal error: {ex}"})

        def do_DELETE(self):  # noqa: N802
            path = self.path.split("?")[0].rstrip("/")
            if not path.startswith("/api/v1/validate/"):
                self._json(404, {"detail": "Not found"})
                return
            vid = path.rsplit("/", 1)[1]
            st = server.cancel(vid) if _ID_RE.match(vid) else None
            if st is None:
                self._json(404, {"detail": "Validation not found"})
            elif st != CANCELLED:
                self._json(400, {"detail":
                                 f"Cannot cancel {st} validation"})
            else:
                self._json(200, {"validation_id": vid,
                                 "status": CANCELLED})

    return Handler


def serve(host: str = "127.0.0.1", port: int = 8099, *,
          reports_dir: str = "/tmp/bdvr_reports") -> ThreadingHTTPServer:
    """Build a ready-to-run HTTP server (caller calls ``serve_forever`` —
    the CLI does; tests drive it from a thread). The caller owns the Ray
    session."""
    state = ValidationServer(reports_dir)
    httpd = ThreadingHTTPServer((host, port), _make_handler(state))
    httpd.validation_state = state  # for tests / shutdown
    return httpd
