"""Fake DVID HTTP server test for the streaming DVID loader
(SURVEY.md §4: 'an HTTP-level fake DVID/precomputed server')."""

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from transfer_em_tpu.data import create_dataset_from_generator, volume3d_dvid
from transfer_em_tpu.data.sources import fetch_raw_dvid


@pytest.fixture(scope="module")
def fake_dvid():
    """Serves /api/node/<uuid>/<instance>/raw/0_1_2/<sx_sy_sz>/<ox_oy_oz>
    from a synthetic zyx volume, like a DVID uint8blk instance
    (reference generators.py:170-223 documents the contract)."""
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(96, 96, 96), dtype=np.uint8)  # zyx

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            mi = re.match(r"/api/node/(\w+)/(\w+)/info$", self.path)
            if mi:
                # DVID instance info JSON (the reference's wrong-length
                # diagnostic reads Base.TypeName from this route).
                body = (b'{"Base": {"TypeName": "uint64blk", '
                        b'"Name": "%s"}}' % mi.group(2).encode())
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            m = re.match(
                r"/api/node/(\w+)/(\w+)/raw/0_1_2/(\d+)_(\d+)_(\d+)/"
                r"(-?\d+)_(-?\d+)_(-?\d+)", self.path)
            if not m:
                self.send_response(404)
                self.end_headers()
                return
            if m.group(2) == "labels64":
                # Simulate a non-uint8 instance: 8 bytes/voxel -> wrong length
                sx, sy, sz = (int(m.group(i)) for i in (3, 4, 5))
                body = b"\0" * (sx * sy * sz * 8)
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            sx, sy, sz = (int(m.group(i)) for i in (3, 4, 5))
            ox, oy, oz = (int(m.group(i)) for i in (6, 7, 8))
            out = np.zeros((sz, sy, sx), np.uint8)
            z0, z1 = max(0, oz), min(96, oz + sz)
            y0, y1 = max(0, oy), min(96, oy + sy)
            x0, x1 = max(0, ox), min(96, ox + sx)
            if z0 < z1 and y0 < y1 and x0 < x1:
                out[z0 - oz:z1 - oz, y0 - oy:y1 - oy, x0 - ox:x1 - ox] = \
                    vol[z0:z1, y0:y1, x0:x1]
            body = out.tobytes()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, vol
    server.shutdown()


def test_fetch_raw_dvid(fake_dvid):
    url, vol = fake_dvid
    got = fetch_raw_dvid(url, "abc9", "grayscale", [[8, 16, 24], [24, 48, 56]])
    np.testing.assert_array_equal(got, vol[8:24, 16:48, 24:56])


def test_fetch_raw_dvid_length_check(fake_dvid):
    url, vol = fake_dvid
    # a bad instance path 404s -> raise_for_status
    import requests
    with pytest.raises(requests.HTTPError):
        fetch_raw_dvid(url, "abc9", "bad/instance", [[0, 0, 0], [8, 8, 8]])


def test_fetch_instance_info(fake_dvid):
    url, _ = fake_dvid
    from transfer_em_tpu.data.sources import fetch_instance_info
    info = fetch_instance_info(url, "abc9", "grayscale")
    assert info["Base"]["TypeName"] == "uint64blk"


def test_wrong_length_error_names_instance_type(fake_dvid):
    """The wrong-length diagnostic fetches the instance's info and names its
    ACTUAL type, like the reference (generators.py:214-220)."""
    url, _ = fake_dvid
    with pytest.raises(RuntimeError, match=r"has type 'uint64blk'.*uint8"):
        fetch_raw_dvid(url, "abc9", "labels64", [[0, 0, 0], [8, 8, 8]])


def test_cloudrun_fetch_error_diagnostics(monkeypatch):
    """A failed Cloud Run /volume fetch raises with HTTP status + body
    snippet (not a bare 'cloud run failed'), and a missing gcloud warns
    once instead of silently degrading."""
    import warnings

    from transfer_em_tpu.data.sources import CloudRunFetcher

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            body = b"location not found: gs://nope"
            self.send_response(500)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        monkeypatch.setattr(CloudRunFetcher, "_token_warning_issued", False)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            f = CloudRunFetcher(url, "gs://nope")   # gcloud missing -> warn
            with pytest.raises(RuntimeError) as ei:
                f.fetch((0, 0, 0), 8)
        msg = str(ei.value)
        assert "HTTP 500" in msg and "location not found" in msg
        assert url in msg
        token_warnings = [w for w in caught
                          if "identity-token" in str(w.message)]
        # init + the in-fetch refresh both fail, but the warning fires ONCE
        assert len(token_warnings) == 1
    finally:
        server.shutdown()


def test_volume3d_dvid_stream(fake_dvid):
    url, vol = fake_dvid
    src = volume3d_dvid(url, "abc9", "grayscale",
                        bbox=((0, 0, 0), (30, 30, 30)), size=16, seed=5)
    it = src()
    cubes = [next(it) for _ in range(4)]
    assert all(c.shape == (16, 16, 16) and c.dtype == np.uint8 for c in cubes)
    # seeded: a second stream yields the same cubes
    it2 = src()
    for c in cubes:
        np.testing.assert_array_equal(next(it2), c)


def test_volume3d_dvid_with_pipeline(fake_dvid):
    url, vol = fake_dvid
    src = volume3d_dvid(url, "abc9", "grayscale",
                        bbox=((0, 0, 0), (40, 40, 40)), size=16, seed=1)
    ds, meanstd = create_dataset_from_generator(src, batch_size=2,
                                                epoch_size=4)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0].shape == (2, 16, 16, 16, 1)
