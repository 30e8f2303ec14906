"""Dynamic controller / UDF submission (SURVEY §2C's last row).

Reference: the StreamManager accepts controller bytecode over REST and
loads it into the running JVM (controlplane/streammanager/
StreamManager.java:1037-1059 registerNewController; ByteClassLoader
.java:111-124 defines the class from submitted bytes). SURVEY scopes
this as "document; not correctness-gated" — here is the thin Spark-side
image: Python SOURCE is compiled in-process (``compile`` + module exec,
the CPython analogue of defineClass) and registered in a name→object
registry that ``run_scripted`` drives can resolve; an optional stdlib
HTTP endpoint accepts submissions over the wire.

Security note (same posture as the reference, which loads arbitrary
bytecode): submission executes code in-process — bind the endpoint to
localhost and treat it as an operator-facing admin surface, never a
tenant-facing one.
"""

from __future__ import annotations

import json
import threading
import types
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any

_REGISTRY: dict[str, Any] = {}
_LOCK = threading.Lock()


def submit_controller(name: str, source: str, class_name: str | None = None) -> Any:
    """Compile ``source`` in-memory and register the controller it
    defines (a class with ``on_stage(stage, plan, op)`` — the same
    contract as controllers.py). ``class_name`` defaults to ``name``.

    Re-submission under an existing name REPLACES it — the hot-swap the
    reference performs by re-registering a controller class."""
    mod = types.ModuleType(f"trisk_dynamic_{name}")
    code = compile(source, f"<submitted:{name}>", "exec")
    exec(code, mod.__dict__)
    cls = getattr(mod, class_name or name)
    instance = cls() if isinstance(cls, type) else cls
    if not callable(getattr(instance, "on_stage", None)):
        raise TypeError(f"controller {name!r} has no on_stage(stage, plan, op)")
    with _LOCK:
        _REGISTRY[name] = instance
    return instance


def get_controller(name: str) -> Any:
    with _LOCK:
        return _REGISTRY[name]


def list_controllers() -> list[str]:
    with _LOCK:
        return sorted(_REGISTRY)


class _Handler(BaseHTTPRequestHandler):
    """POST /controllers {"name": ..., "source": ..., "class_name": ...}
    → 200 {"registered": name}; GET /controllers → name list."""

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path != "/controllers":
            self.send_error(404)
            return
        body = json.dumps({"controllers": list_controllers()}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):  # noqa: N802
        if self.path != "/controllers":
            self.send_error(404)
            return
        n = int(self.headers.get("Content-Length", 0))
        try:
            req = json.loads(self.rfile.read(n))
            submit_controller(
                req["name"], req["source"], req.get("class_name")
            )
        except Exception as e:  # noqa: BLE001 — report, don't kill the server
            self.send_response(400)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps({"error": str(e)}).encode())
            return
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps({"registered": req["name"]}).encode())


def serve_submissions(host: str = "127.0.0.1", port: int = 0) -> HTTPServer:
    """Start the submission endpoint on a daemon thread; returns the
    server (``server.server_address[1]`` is the bound port; call
    ``server.shutdown()`` to stop). Port 0 picks a free port."""
    srv = HTTPServer((host, port), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
