"""Data-access service: POST /volume and GET /slice/... over HTTP.

Reproduces the reference Cloud Run data service
(cloudrun_functions/transferem.py):

* ``POST /volume``   {location, start[xyz], size[xyz], scale_index?, jpeg?}
  -> raw bytes, F-order xyz == C-order zyx (transferem.py:109-192), or JPEG
  for a single slice.
* ``GET /slice/<x_y_z>/<sx_sy_sz>/<fmt>?location=...`` -> 2D image with a
  256-entry LRU cache capped at 1 MB/entry (transferem.py:26-106).

Implementation: stdlib ThreadingHTTPServer (Flask is not in the image); same
routes, JSON bodies, and byte contracts, so the reference's clients work
against it unchanged.  Error handling mirrors the reference: any exception ->
HTTP 400 with the traceback text.
"""

from __future__ import annotations

import io
import json
import os
import threading
import traceback
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from .backends import open_volume


class LruCache:
    """Memory-capped LRU: entries over 1 MB are not cached
    (reference transferem.py:26-46)."""

    def __init__(self, limit: int = 256, max_entry: int = 1_000_000):
        self.cache: "OrderedDict[str, bytes]" = OrderedDict()
        self.limit = limit
        self.max_entry = max_entry
        self._lock = threading.Lock()

    def get(self, key: str) -> Optional[bytes]:
        with self._lock:
            if key not in self.cache:
                return None
            self.cache.move_to_end(key)
            return self.cache[key]

    def put(self, key: str, val: bytes) -> None:
        if len(val) > self.max_entry:
            return
        with self._lock:
            self.cache[key] = val
            self.cache.move_to_end(key)
            if len(self.cache) > self.limit:
                self.cache.popitem(last=False)


def _encode_image(data2d: np.ndarray, fmt: str) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(data2d).save(buf, format=fmt.upper().replace("JPG", "JPEG"))
    return buf.getvalue()


def make_handler(slice_cache: LruCache):
    class Handler(BaseHTTPRequestHandler):
        # Socket timeout: a half-sent body must not pin a handler thread
        # forever (same hardening as the model service).
        timeout = 120

        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(body)

        def do_OPTIONS(self):
            # CORS preflight: the reference ran flask_cors CORS(app)
            # (cloudrun_functions/transferem.py:21), which answers
            # preflights; without this, a browser's cross-origin POST
            # /volume (Content-Type: application/json triggers preflight)
            # would be blocked at the 501 BaseHTTPRequestHandler default.
            self.send_response(204)
            self.send_header("Access-Control-Allow-Origin", "*")
            self.send_header("Access-Control-Allow-Methods",
                             "GET, POST, OPTIONS")
            self.send_header("Access-Control-Allow-Headers",
                             "Content-Type, Authorization")
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/volume":
                return self._send(404, b"not found", "text/plain")
            try:
                length = int(self.headers.get("Content-Length", 0))
                config = json.loads(self.rfile.read(length))
                location = config["location"]
                if location.startswith("gs://"):
                    location = location[len("gs://"):]
                start = config["start"]   # xyz
                size = config["size"]     # xyz
                scale_index = config.get("scale_index", 0)
                use_jpeg = config.get("jpeg", False)
                vol = open_volume(location, scale_index)
                data_zyx = vol.read(start, size)
                if not use_jpeg or size[2] > 1:
                    # C-order zyx bytes == F-order xyz bytes
                    self._send(200, data_zyx.tobytes(),
                               "application/octet-stream")
                else:
                    img = np.squeeze(data_zyx)  # (sy, sx) -> y-major 2D
                    self._send(200, _encode_image(img, "jpeg"), "image/jpeg")
            except Exception:
                self._send(400, traceback.format_exc().encode(), "text/plain")

        def do_GET(self):
            parsed = urlparse(self.path)
            if parsed.path.rstrip("/") == "/healthz":
                # Liveness/readiness for Cloud Run-style deployment.
                return self._send(200, b"ok", "text/plain")
            parts = parsed.path.strip("/").split("/")
            if len(parts) != 4 or parts[0] != "slice":
                return self._send(404, b"not found", "text/plain")
            try:
                startstr, sizestr, fmt = parts[1], parts[2], parts[3]
                start = [int(v) for v in startstr.split("_")]
                size = [int(v) for v in sizestr.split("_")]
                q = parse_qs(parsed.query)
                location = q["location"][0]
                if 1 not in size[:3]:
                    return self._send(400, b"one dimension must be size 1",
                                      "text/plain")
                # Tuple key rather than the reference's "_"-joined string
                # (transferem.py:72): the string form is unambiguous only
                # because start/size are always exactly 3 ints and fmt one
                # token — the tuple needs no such argument, and the cache
                # is internal so no wire contract changes.
                key = (location, startstr, sizestr, fmt)
                resp = slice_cache.get(key)
                if resp is None:
                    vol = open_volume(location)
                    data = np.squeeze(vol.read(start, size))
                    resp = _encode_image(data, fmt)
                    slice_cache.put(key, resp)
                self._send(200, resp, f"image/{fmt}")
            except Exception:
                self._send(400, traceback.format_exc().encode(), "text/plain")

    return Handler


class DataService:
    """Threaded HTTP service; ``start()`` returns the bound port.

    ``workers=N`` runs N prefork worker PROCESSES all accepting from the one
    inherited listening socket (classic gunicorn prefork — the reference's
    production data service ran 9 gunicorn workers x 2 threads,
    cloudrun_functions/Dockerfile CMD).  Each worker is itself threaded, so
    concurrency is N processes x unbounded threads; CPU-bound slice/volume
    encoding (PIL, gzip, tobytes) scales past the GIL.  Per-worker LRU
    caches, same as the reference's per-gunicorn-worker caches.  Volumes
    must be registered BEFORE ``start()`` — workers inherit the registry by
    fork.  ``workers=0`` (default) keeps the single-process threaded server.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 workers: int = 0):
        self.cache = LruCache()
        self.server = ThreadingHTTPServer((host, port),
                                          make_handler(self.cache))
        self.workers = int(workers)
        self._pids: list = []
        self._thread: Optional[threading.Thread] = None
        self._stopping = threading.Event()

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    @property
    def url(self) -> str:
        host, port = self.server.server_address[:2]
        return f"http://{host}:{port}"

    def _fork_worker(self) -> int:
        import signal

        pid = os.fork()
        if pid == 0:  # worker: accept from the inherited socket
            try:
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                self.server.serve_forever()
            finally:
                os._exit(0)
        return pid

    def _monitor_workers(self):
        """Reap dead workers and refork them (gunicorn arbiter parity —
        the reference's production service relied on gunicorn respawning
        crashed workers; without this, a crashed worker silently reduces
        capacity and a total die-off leaves the parent's listen socket
        accepting TCP connects that no process ever serves)."""
        import warnings

        while not self._stopping.is_set():
            self._stopping.wait(0.5)
            if self._stopping.is_set():
                return
            for i, pid in enumerate(list(self._pids)):
                try:
                    done, status = os.waitpid(pid, os.WNOHANG)
                except ChildProcessError:  # reaped elsewhere: still dead
                    done, status = pid, "?"
                if done:
                    warnings.warn(
                        f"data-service worker {pid} died "
                        f"(status {status}); reforking", RuntimeWarning)
                    self._pids[i] = self._fork_worker()

    def start(self) -> int:
        if self.workers:
            # Warm lazily-imported modules BEFORE forking: a fork taken
            # while another thread holds an import lock would deadlock the
            # child on its first `from PIL import Image`.
            from PIL import Image  # noqa: F401
            for _ in range(self.workers):
                self._pids.append(self._fork_worker())
            self._thread = threading.Thread(target=self._monitor_workers,
                                            daemon=True)
            self._thread.start()
            return self.port
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self.port

    def stop(self):
        if self._pids:
            import signal

            self._stopping.set()  # stop the monitor BEFORE killing workers
            if self._thread:
                self._thread.join(timeout=5)
            for pid in self._pids:
                try:
                    os.kill(pid, signal.SIGTERM)
                except ProcessLookupError:
                    pass
            for pid in self._pids:
                try:
                    os.waitpid(pid, 0)
                except ChildProcessError:
                    pass
            self._pids = []
            self.server.server_close()
            return
        self.server.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.server.server_close()  # release the listening socket


def serve_until_signal(svc):  # pragma: no cover
    """Run a service in the foreground, stopping cleanly on SIGTERM/SIGINT
    (Cloud Run sends SIGTERM before killing the container)."""
    import signal

    done = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: done.set())
    svc.start()
    done.wait()
    svc.stop()


def _register_env_volumes():  # pragma: no cover
    """DATA_VOLUMES="name=/path/a.npy,other=/path/b.npy": serve local numpy
    arrays under those locations (self-hosted analogue of the reference's
    GCS-bucket locations; also what bench_serve's combined mode uses to hand
    a synthetic volume to a CLEAN service process — forking workers from a
    JAX-loaded process can deadlock on inherited locks)."""
    import numpy as np

    from .backends import NumpyVolume, register_volume

    spec = os.environ.get("DATA_VOLUMES", "")
    for item in filter(None, spec.split(",")):
        name, path = item.split("=", 1)
        register_volume(name.strip(),
                        NumpyVolume(np.load(path.strip(), mmap_mode="r")))
        print(f"registered volume {name.strip()} from {path.strip()}")


def main():  # pragma: no cover
    _register_env_volumes()
    svc = DataService(host="0.0.0.0",
                      port=int(os.environ.get("PORT", 8080)),
                      workers=int(os.environ.get("DATA_WORKERS", "0")))
    print(f"data service on {svc.url} "
          f"({svc.workers or 'single'}-process)")
    serve_until_signal(svc)


if __name__ == "__main__":  # pragma: no cover
    main()
