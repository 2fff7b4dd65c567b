"""C10: the TF/JAX-free AI-Platform client (reference predict_cloud.py:11-52).

The real googleapiclient needs cloud credentials; these tests inject a fake
``googleapiclient.discovery`` module that replays the ``projects.predict``
call chain and verify payload shape, base64 decode, zyx reshape, and the
error path.
"""

import base64
import sys
import types

import numpy as np
import pytest

from transfer_em_tpu.serve.client import predict_cloud


class _Chain:
    """Mimics service.projects().predict(name=..., body=...).execute()."""

    def __init__(self, response):
        self.response = response
        self.calls = []

    def projects(self):
        return self

    def predict(self, name, body):
        self.calls.append((name, body))
        return self

    def execute(self):
        return self.response


@pytest.fixture
def fake_discovery(monkeypatch):
    mod = types.ModuleType("googleapiclient")
    disc = types.ModuleType("googleapiclient.discovery")
    state = {}

    def build(api, version):
        state["api"] = (api, version)
        return state["service"]

    disc.build = build
    mod.discovery = disc
    monkeypatch.setitem(sys.modules, "googleapiclient", mod)
    monkeypatch.setitem(sys.modules, "googleapiclient.discovery", disc)
    return state


@pytest.mark.parametrize("as_str", [True, False])
def test_predict_cloud_decodes_volume(fake_discovery, as_str):
    size = [4, 3, 2]  # xyz request -> zyx (2,3,4) array
    vol = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
    payload = base64.encodebytes(vol.tobytes())
    if as_str:
        payload = payload.decode("ascii")
    svc = _Chain({"predictions": payload})
    fake_discovery["service"] = svc

    got = predict_cloud("proj", "mdl", "bucket/vol", "https://svc",
                        start=[10, 20, 30], size=size, version="v7")
    np.testing.assert_array_equal(got, vol)

    assert fake_discovery["api"] == ("ml", "v1")
    name, body = svc.calls[0]
    assert name == "projects/proj/models/mdl/versions/v7"
    assert body["instances"] == [{"location": "bucket/vol",
                                  "cloudrun": "https://svc",
                                  "start": [10, 20, 30], "size": size}]


def test_predict_cloud_no_version_and_error(fake_discovery):
    svc = _Chain({"error": "model not deployed"})
    fake_discovery["service"] = svc
    with pytest.raises(RuntimeError, match="model not deployed"):
        predict_cloud("p", "m", "loc", "cr", [0, 0, 0], [1, 1, 1])
    name, _ = svc.calls[0]
    assert name == "projects/p/models/m"
