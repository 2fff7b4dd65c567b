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
            m = re.match(
                r"/api/node/(\w+)/(\w+)/raw/0_1_2/(\d+)_(\d+)_(\d+)/"
                r"(-?\d+)_(-?\d+)_(-?\d+)", self.path)
            if not m:
                self.send_response(404)
                self.end_headers()
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
