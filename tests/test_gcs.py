"""Faked-GCS coverage of the gs:// transports (VERDICT r3 missing item 2).

The production output path writes neuroglancer blocks to GCS buckets
(reference model_cloudrun/transferem.py:158-189, custom_online/
predictor.py:100-148) and fetches models from the MODEL_BUCKET bucket
(model_cloudrun/transferem.py:85-116).  No network here, so
``google.cloud.storage.Client`` is replaced by an in-memory fake that
records exactly what a real bucket would receive (blob names, payload
bytes, content encoding/type) — a typo in blob naming or prefix layout
fails these tests instead of shipping silently.
"""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.config import ExportMeta
from transfer_em_tpu.infer.export import export_generator
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.serve import DataService, NumpyVolume, register_volume

pytest.importorskip("google.cloud.storage")


# ------------------------------------------------------ in-memory GCS fake

class FakeBlob:
    def __init__(self, store, name):
        self._store = store
        self.name = name
        self.content_encoding = None

    def upload_from_string(self, data, content_type=None):
        if isinstance(data, str):
            data = data.encode()
        self._store[self.name] = {
            "data": bytes(data),
            "content_encoding": self.content_encoding,
            "content_type": content_type,
        }

    def download_to_filename(self, filename):
        with open(filename, "wb") as f:
            f.write(self._store[self.name]["data"])


class FakeBucket:
    def __init__(self, buckets, name):
        self.name = name
        self.store = buckets.setdefault(name, {})

    def blob(self, name):
        return FakeBlob(self.store, name)


@pytest.fixture()
def fake_gcs(monkeypatch):
    """Patch google.cloud.storage.Client; returns {bucket: {blob: rec}}."""
    from google.cloud import storage

    buckets = {}

    class FakeClient:
        def __init__(self, *a, **k):
            pass

        def bucket(self, name):
            return FakeBucket(buckets, name)

        def list_blobs(self, bucket, prefix=""):
            store = (bucket.store if isinstance(bucket, FakeBucket)
                     else buckets.setdefault(bucket, {}))
            for name in sorted(store):
                if name.startswith(prefix):
                    yield FakeBlob(store, name)

    monkeypatch.setattr(storage, "Client", FakeClient)
    return buckets


# ------------------------------------------------------------ block writer

def test_write_ng_blocks_gcs_blob_contract(fake_gcs):
    """Block names, prefix layout, gzip payloads, and headers match the
    reference upload (model_cloudrun/transferem.py:172-189)."""
    from transfer_em_tpu.serve.model_service import write_ng_blocks

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(64, 64, 128), dtype=np.uint8)  # zyx
    write_ng_blocks(data, "gs://out-bucket/pred/run1", (256, 64, 0))

    store = fake_gcs["out-bucket"]
    assert sorted(store) == ["pred/run1/256-320_64-128_0-64",
                             "pred/run1/320-384_64-128_0-64"]
    for name, rec in store.items():
        assert rec["content_encoding"] == "gzip"
        assert rec["content_type"] == "application/octet-stream"
        x0 = int(name.rsplit("/", 1)[1].split("-")[0]) - 256
        block = np.frombuffer(gzip.decompress(rec["data"]),
                              np.uint8).reshape(64, 64, 64)
        np.testing.assert_array_equal(block, data[:, :, x0:x0 + 64])


def test_write_ng_blocks_gcs_matches_local_dir(fake_gcs, tmp_path):
    """The gs:// branch and the local-dir branch produce byte-identical
    artifacts under identical names."""
    from transfer_em_tpu.serve.model_service import write_ng_blocks

    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=(128, 64, 64), dtype=np.uint8)
    write_ng_blocks(data, "gs://b/p", (0, 0, 64))
    write_ng_blocks(data, str(tmp_path / "local"), (0, 0, 64))

    # (decompress both: gzip.compress stamps wall-clock MTIME in the header)
    local = {n: gzip.decompress(open(tmp_path / "local" / n, "rb").read())
             for n in os.listdir(tmp_path / "local")}
    gcs = {n[len("p/"):]: gzip.decompress(rec["data"])
           for n, rec in fake_gcs["b"].items()}
    assert local == gcs and len(local) == 2


# ----------------------------------------------------- ng-output predictor

@pytest.fixture(scope="module")
def exported3d(tmp_path_factory):
    d = tmp_path_factory.mktemp("export") / "model"
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    meta = ExportMeta(buffer=17, outdimsize=40, meanstd_x=(0.1, 0.9),
                      meanstd_y=(0.2, 1.1), dimsize=74, is3d=True, wf=32)
    export_generator(params, meta, str(d))
    return str(d), gen, params, meta


@pytest.fixture(scope="module")
def data_service():
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)
    register_volume("gcsbucket/vol", NumpyVolume(vol))
    svc = DataService()
    svc.start()
    yield svc
    svc.stop()


def test_ng_output_predictor_gcs(fake_gcs, exported3d, data_service):
    """NgOutputPredictor with a gs:// dest_root publishes the ng volume to
    the bucket: PLAIN info manifest (reference custom_online/predictor.py:
    126-127 uploads it without gzip) + gzip blocks under <name>/64_64_64/,
    and the result equals the local-dir rendition of the same prediction."""
    from transfer_em_tpu.serve import NgOutputPredictor

    d, *_ = exported3d
    pred = NgOutputPredictor.from_path(d, dest_root="gs://ng-bucket/tmp")
    inst = {"location": "gcsbucket/vol", "cloudrun": data_service.url,
            "start": (64, 64, 64), "size": (64, 64, 64)}
    (url,) = pred.predict([inst])
    pred.close()
    assert url.startswith("https://") and "precomputed://gs://ng-bucket" in url

    store = fake_gcs["ng-bucket"]
    names = sorted(store)
    assert len(names) == 2, names
    info_name, = [n for n in names if n.endswith("/info")]
    block_name, = [n for n in names if "/64_64_64/" in n]
    run = info_name[len("tmp/"):-len("/info")]
    assert block_name == f"tmp/{run}/64_64_64/0-64_0-64_0-64"

    # info: PLAIN JSON, no content-encoding.
    info_rec = store[info_name]
    assert info_rec["content_encoding"] is None
    info = json.loads(info_rec["data"])
    assert info["scales"][0]["size"] == [64, 64, 64]
    assert info["scales"][0]["chunk_sizes"] == [[64, 64, 64]]

    # block: gzip, and identical voxels to the local-dir predictor run.
    pred_local = NgOutputPredictor.from_path(
        d, dest_root=str(os.path.join(os.path.dirname(d), "ng_local")))
    pred_local.predict([dict(inst)])
    pred_local.close()
    import glob
    (local_block,) = glob.glob(os.path.join(
        os.path.dirname(d), "ng_local", "*", "64_64_64", "*"))
    # gzip.compress stamps MTIME in the header; compare the voxel payloads
    assert (gzip.decompress(open(local_block, "rb").read())
            == gzip.decompress(store[block_name]["data"]))


# ------------------------------------------------------- model cache fetch

def test_model_cache_fetches_from_gcs(fake_gcs, exported3d):
    """ModelCache with a gs:// root stages the export dir from the bucket
    (reference MODEL_BUCKET download, model_cloudrun/transferem.py:85-116)
    and serves the same params as the local export."""
    from transfer_em_tpu.serve.model_service import ModelCache

    d, gen, params, meta = exported3d
    store = fake_gcs.setdefault("model-bucket", {})
    for fname in os.listdir(d):
        with open(os.path.join(d, fname), "rb") as f:
            FakeBlob(store, f"models/em2em/v1/{fname}").upload_from_string(
                f.read())

    cache = ModelCache("gs://model-bucket/models")
    gen2, params2, meta2, _ = cache.get("em2em:v1")
    assert meta2.buffer == meta.buffer and meta2.wf == meta.wf
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # second get: cache hit, no re-download (entry identity preserved)
    assert cache.get("em2em:v1")[1] is params2

    with pytest.raises(FileNotFoundError, match="no model blobs"):
        cache.get("missing:v9")
    cache.close()


# ----------------------------------------------- tensorstore gcs spec shape

def test_open_tensorstore_gcs_spec(monkeypatch):
    """'bucket/path' locations build the gcs kvstore spec the reference uses
    (generators.py:116-126): bucket = first component, path = the rest."""
    import tensorstore as ts

    from transfer_em_tpu.data import sources

    captured = {}

    class FakeDS:
        def __getitem__(self, *_):
            return self

        def result(self):
            return self

    def fake_open(spec):
        captured.update(spec)
        return FakeDS()

    monkeypatch.setattr(ts, "open", fake_open)
    sources.open_tensorstore("mybucket/em/snapshot", scale_index=2)
    assert captured["kvstore"] == {"driver": "gcs", "bucket": "mybucket"}
    assert captured["path"] == "em/snapshot"
    assert captured["scale_index"] == 2


def test_model_cache_miss_does_not_convoy_hits(fake_gcs, exported3d):
    """A slow gs:// download for one model must NOT block concurrent gets
    for an already-resident model (the load runs outside the cache lock),
    and concurrent misses for the SAME name coalesce onto one download."""
    import threading
    import time as _time

    from transfer_em_tpu.serve.model_service import ModelCache

    d, gen, params, meta = exported3d
    store = fake_gcs.setdefault("model-bucket", {})
    for fname in os.listdir(d):
        with open(os.path.join(d, fname), "rb") as f:
            data = f.read()
        for ver in ("v1", "v2"):
            FakeBlob(store, f"models/em2em/{ver}/{fname}").upload_from_string(
                data)

    cache = ModelCache("gs://model-bucket/models", capacity=2)
    resident = cache.get("em2em:v1")

    gate = threading.Event()
    downloads = [0]
    orig = ModelCache._download_gcs_model

    def slow_download(self, parts):
        downloads[0] += 1
        assert gate.wait(30)  # hold the MISS until the hit path is probed
        return orig(self, parts)

    ModelCache._download_gcs_model = slow_download
    try:
        t0 = threading.Thread(target=cache.get, args=("em2em:v2",))
        t1 = threading.Thread(target=cache.get, args=("em2em:v2",))
        t0.start(); t1.start()
        _time.sleep(0.2)  # both miss-threads are inside the slow download
        # Cache HIT for the resident model completes while the miss hangs.
        start = _time.monotonic()
        assert cache.get("em2em:v1") is resident
        assert _time.monotonic() - start < 5.0
        gate.set()
        t0.join(timeout=30); t1.join(timeout=30)
        assert not t0.is_alive() and not t1.is_alive()
    finally:
        ModelCache._download_gcs_model = orig
        gate.set()
    assert downloads[0] == 1  # same-name misses coalesced onto one loader
    assert cache.get("em2em:v2")[2].wf == meta.wf
    cache.close()


def test_model_cache_eviction_reclaims_staging_dir(fake_gcs, exported3d):
    """Under eviction/reload churn each evicted gs:// model's staging dir is
    deleted AT EVICTION, not hoarded until close() (ADVICE round 4: a
    long-lived service alternating models would otherwise grow disk use by
    one stale dir per re-download)."""
    from transfer_em_tpu.serve.model_service import ModelCache

    d, gen, params, meta = exported3d
    store = fake_gcs.setdefault("model-bucket", {})
    for fname in os.listdir(d):
        with open(os.path.join(d, fname), "rb") as f:
            data = f.read()
        for ver in ("v1", "v2"):
            FakeBlob(store, f"models/em2em/{ver}/{fname}").upload_from_string(
                data)

    cache = ModelCache("gs://model-bucket/models", capacity=1)
    try:
        cache.get("em2em:v1")
        root = cache._gcs_dir
        assert root is not None and len(os.listdir(root)) == 1
        for _ in range(3):  # churn: each get evicts the other model
            cache.get("em2em:v2")
            assert len(os.listdir(root)) == 1  # v1's staging dir reclaimed
            cache.get("em2em:v1")
            assert len(os.listdir(root)) == 1
    finally:
        cache.close()
    assert not os.path.exists(root)  # close() reclaims the staging root


def test_model_cache_close_races_inflight_load(exported3d, tmp_path):
    """A load that COMPLETES after close() must not re-insert its entry
    (ADVICE round 4: that left a live batcher worker thread close()'s
    sweep had already missed).  Local root so the gated load still finds
    its files after close(); a gs:// load racing close() instead fails at
    read time (staging root reclaimed) — either way no entry survives."""
    import shutil
    import threading

    from transfer_em_tpu.serve import model_service as ms

    d, gen, params, meta = exported3d
    root = tmp_path / "models"
    (root / "em2em").mkdir(parents=True)
    shutil.copytree(d, root / "em2em" / "v1")

    built = []

    def factory(g, p, m):
        from transfer_em_tpu.infer.batcher import make_tile_batcher
        b = make_tile_batcher(g.apply, p, m.meanstd_x, m.meanstd_y,
                              m.outdimsize, m.buffer, max_batch=4)
        built.append(b)
        return b

    cache = ms.ModelCache(str(root), batcher_factory=factory)
    gate = threading.Event()
    entered = threading.Event()
    orig = ms.load_generator

    def slow_load(path):
        entered.set()
        gate.wait(30)  # hold the load until close() has run
        return orig(path)

    ms.load_generator = slow_load
    errs = []

    def loader():
        try:
            cache.get("em2em:v1")
        except RuntimeError as e:
            errs.append(e)

    t = threading.Thread(target=loader)
    try:
        t.start()
        assert entered.wait(10)  # loader is inside the gated load_generator
        cache.close()
        gate.set()
        t.join(timeout=30)
    finally:
        ms.load_generator = orig
        gate.set()
    assert not t.is_alive()
    assert len(errs) == 1 and "closed" in str(errs[0])
    assert cache._entries == {} and cache._staging == {}
    assert built and built[0]._closed  # the fresh batcher was closed
    with pytest.raises(RuntimeError, match="closed"):
        cache.get("em2em:v1")
