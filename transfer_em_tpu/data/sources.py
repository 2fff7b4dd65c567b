"""Remote-volume sources: DVID, neuroglancer-precomputed, Cloud-Run HTTP.

TPU-native replacement for reference transfer_em/datasets/generators.py:

* ``volume3d_dvid``  (generators.py:12-56): random corners in a bbox (or an
  explicit ROI list) fetched from DVID's raw uint8 HTTP API.
* ``volume3d_ng``    (generators.py:59-165): same over neuroglancer
  precomputed, via local tensorstore or a Cloud Run ``/volume`` proxy with
  gcloud identity-token auth + one retry on stale token.
* ``fetch_raw_dvid`` (generators.py:170-223): raw GET with response-length
  validation.

Instead of tf.py_function graph escapes, sources are plain callables
returning iterators of uint8 numpy cubes; a thread pool overlaps many HTTP /
tensorstore reads (the reference relied on tf.data AUTOTUNE for this).
Sampling is seeded and reproducible per SURVEY.md §4 determinism notes;
``sample_array``/``sample_class`` stratified ROI sampling is preserved.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import subprocess
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

BBox = Tuple[Tuple[int, int, int], Tuple[int, int, int]]


def host_sharded_seed(seed: Optional[int]) -> Optional[int]:
    """Derive a per-host seed so multi-host training samples disjoint ROI
    streams reproducibly (SURVEY.md §7 "per-host sharded ROI sampling").

    Same seed + same process count -> same global sample set, partitioned.
    """
    if seed is None:
        return None
    import jax
    return seed * 1_000_003 + jax.process_index()


def with_retries(fetch: Callable, attempts: int = 3,
                 backoff: float = 0.5) -> Callable:
    """Wrap a fetcher with bounded retry + exponential backoff.

    Generalizes the reference's ad-hoc single retry on stale Cloud Run tokens
    (generators.py:147-153) to all transports.
    """
    import time as _time

    def wrapped(*args, **kwargs):
        err = None
        for i in range(attempts):
            try:
                return fetch(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — transport errors vary
                err = e
                if i + 1 < attempts:
                    _time.sleep(backoff * (2 ** i))
        raise err

    return wrapped


# --------------------------------------------------------------------- DVID

def fetch_instance_info(server: str, uuid: str, instance: str,
                        session=None) -> dict:
    """Fetch a DVID data instance's info JSON (``GET .../{instance}/info``).

    The reference's wrong-length diagnostic calls this to name the
    instance's actual type (generators.py:215-216); the key of interest is
    ``info["Base"]["TypeName"]``.
    """
    import requests
    if session is None:
        session = requests.Session()
    r = session.get(f"{server}/api/node/{uuid}/{instance}/info")
    r.raise_for_status()
    return r.json()


def fetch_raw_dvid(server: str, uuid: str, instance: str, box_zyx,
                   session=None) -> np.ndarray:
    """Fetch a raw uint8 subvolume from DVID (reference generators.py:170-223).

    box_zyx: ((z0,y0,x0), (z1,y1,x1)); returns a C-order zyx array.
    """
    import requests
    if session is None:
        session = requests.Session()
    box_zyx = np.asarray(box_zyx)
    assert np.issubdtype(box_zyx.dtype, np.integer), "box must be integer"
    assert box_zyx.shape == (2, 3)
    shape_zyx = box_zyx[1] - box_zyx[0]
    shape_str = "_".join(map(str, shape_zyx[::-1]))
    offset_str = "_".join(map(str, box_zyx[0, ::-1]))
    r = session.get(
        f"{server}/api/node/{uuid}/{instance}/raw/0_1_2/{shape_str}/{offset_str}")
    r.raise_for_status()
    expected = int(np.prod(shape_zyx))
    if len(r.content) != expected:
        # Name the instance's ACTUAL type in the error, like the reference
        # (generators.py:214-220); fall back gracefully if the info fetch
        # itself fails (the original error is the one that matters).
        try:
            typename = fetch_instance_info(
                server, uuid, instance, session)["Base"]["TypeName"]
            type_clause = f"has type '{typename}'"
        except Exception:  # noqa: BLE001 — diagnostic only
            type_clause = "has unknown type (info fetch failed)"
        raise RuntimeError(
            "Buffer from DVID is the wrong length for the requested array "
            f"({len(r.content)} != {expected}).\n"
            "Did you pass the correct dtype for this instance?\n"
            f"Instance '{instance}' {type_clause}, and you passed dtype=uint8")
    return np.frombuffer(r.content, dtype=np.uint8).reshape(shape_zyx)


# ------------------------------------------------------------- corner sampling

def corner_stream(bbox: Optional[BBox], size: int, seed: Optional[int],
                  array: Optional[Sequence] = None,
                  sample_array: bool = False,
                  sample_class: bool = False) -> Iterator[Tuple[int, int, int]]:
    """Yield (x, y, z) corners — explicit ROI list or random-in-bbox.

    Mirrors reference generators.py:84-108: with ``array`` and not
    ``sample_array``, iterate the list once; otherwise sample forever.
    ``sample_class``: array is a list of lists of bboxes; pick class uniformly
    then bbox uniformly (stratified sampling, generators.py:95-101).

    ``size`` is accepted for reference signature parity but — exactly like
    the reference — does NOT constrain sampling, so cubes whose corner lands
    near the bbox upper bound overhang it by up to size-1 voxels per axis.
    All transports zero-fill outside the volume: DVID server-side, the
    tensorstore transport and the data-service backends client-side (the
    reference's own tensorstore path would raise OutOfRange on such a read,
    generators.py:139-142; generators.py never subtracts ``size`` either).
    """
    if array is not None and not sample_array:
        yield from (tuple(c) for c in array)
        return
    rng = np.random.default_rng(seed)
    while True:
        curr = bbox
        if array is not None:
            tarr = array
            if sample_class:
                tarr = array[rng.integers(0, len(array))]
            curr = tarr[rng.integers(0, len(tarr))]
        x = rng.integers(curr[0][0], curr[1][0])
        y = rng.integers(curr[0][1], curr[1][1])
        z = rng.integers(curr[0][2], curr[1][2])
        yield (int(x), int(y), int(z))


def _parallel_fetch(corners: Iterator[Tuple[int, int, int]],
                    fetch: Callable[[Tuple[int, int, int]], np.ndarray],
                    num_threads: int) -> Iterator[np.ndarray]:
    """Map fetch over corners with a sliding window of in-flight requests,
    preserving order (the TPU-host analogue of tf.data AUTOTUNE map)."""
    if num_threads <= 1:
        for c in corners:
            yield fetch(c)
        return
    ex = cf.ThreadPoolExecutor(max_workers=num_threads)
    pending: List[cf.Future] = []
    try:
        try:
            for _ in range(num_threads * 2):
                pending.append(ex.submit(fetch, next(corners)))
        except StopIteration:
            pass
        while pending:
            fut = pending.pop(0)
            try:
                pending.append(ex.submit(fetch, next(corners)))
            except StopIteration:
                pass
            yield fut.result()
        ex.shutdown(wait=True)
    except BaseException:
        # Abandoned mid-iteration (GeneratorExit on a cancelled request, or
        # a fetch error): DROP the up-to-2*threads queued fetches instead of
        # executing them — a plain `with` block's shutdown(wait=True) would
        # run every pending network read before the caller's finally could
        # release its admission slot (measured ~1 s per 8 pending 0.5 s
        # fetches; VERDICT-r4 review finding).
        for f in pending:
            f.cancel()
        ex.shutdown(wait=False, cancel_futures=True)
        raise


def volume3d_dvid(dvid_server: str, uuid: str, instance: str,
                  bbox: Optional[BBox] = None, size: int = 132,
                  seed: Optional[int] = None, array=None,
                  num_threads: int = 8, retries: int = 3,
                  shard_by_host: bool = False
                  ) -> Callable[[], Iterator[np.ndarray]]:
    """Iterator factory over uint8 ``size``^3 cubes from DVID
    (reference generators.py:12-56).  Pass to
    ``create_dataset_from_generator``.

    shard_by_host: derive a per-host seed for multi-host training.
    """
    import requests

    if shard_by_host:
        seed = host_sharded_seed(seed)

    def make_iter() -> Iterator[np.ndarray]:
        session_local = threading_local_sessions(requests)

        def fetch(corner):
            x, y, z = corner
            return fetch_raw_dvid(
                dvid_server, uuid, instance,
                [[z, y, x], [z + size, y + size, x + size]],
                session_local())

        corners = corner_stream(bbox, size, seed, array)
        return _parallel_fetch(corners, with_retries(fetch, retries),
                               num_threads)

    return make_iter


def threading_local_sessions(requests_mod):
    """One requests.Session per thread (sessions are not thread-safe)."""
    import threading
    local = threading.local()

    def get():
        if not hasattr(local, "s"):
            local.s = requests_mod.Session()
        return local.s

    return get


# ---------------------------------------------------- neuroglancer precomputed

def open_tensorstore(location: str, scale_index: int = 0):
    """Open a neuroglancer-precomputed volume with tensorstore
    (reference generators.py:114-126).  ``location`` = 'bucket/path...'
    or 'file://...' for local test volumes.
    """
    import tensorstore as ts
    if location.startswith("file://"):
        spec = {
            "driver": "neuroglancer_precomputed",
            "kvstore": {"driver": "file", "path": location[len("file://"):]},
            "recheck_cached_data": "open",
            "scale_index": scale_index,
        }
    else:
        parts = location.split("/")
        spec = {
            "driver": "neuroglancer_precomputed",
            "kvstore": {"driver": "gcs", "bucket": parts[0]},
            "path": "/".join(parts[1:]),
            "recheck_cached_data": "open",
            "scale_index": scale_index,
        }
    ds = ts.open(spec).result()
    return ds[ts.d["channel"][0]]


def read_ts_box_zyx(ds, corner_xyz, size_xyz, dom_lo=None, dom_hi=None
                    ) -> np.ndarray:
    """Clamp-to-domain, zero-filled zyx read of an xyz-indexed tensorstore
    box — THE shared edge-semantics implementation for serving reads
    (serve/backends.TensorstoreVolume) and tiled-inference fetches
    (infer/tiling.predict_ng_cube), so an OOB/fill-semantics fix lands
    once (round-5 review; same rule as native.gather_box for host arrays).

    tensorstore raises OutOfRange on any out-of-domain slice, and every
    edge-touching request legitimately plans halo corners past the faces.
    The F-order xyz read transposed to zyx matches the serving byte
    contract (reference cloudrun_functions/transferem.py:146-180)."""
    if dom_lo is None:
        dom_lo = np.asarray(ds.domain.inclusive_min[:3], np.int64)
    if dom_hi is None:
        dom_hi = np.asarray(ds.domain.exclusive_max[:3], np.int64)
    want_lo = np.asarray(corner_xyz, np.int64)
    want_hi = want_lo + np.asarray(size_xyz, np.int64)
    lo = np.maximum(want_lo, dom_lo)
    hi = np.minimum(want_hi, dom_hi)
    sx, sy, sz = (int(v) for v in size_xyz)
    out = np.zeros((sz, sy, sx), np.uint8)  # zyx
    if np.all(lo < hi):
        data = ds[lo[0]:hi[0], lo[1]:hi[1],
                  lo[2]:hi[2]].read(order="F").result()
        sub = np.asarray(data, np.uint8).transpose(2, 1, 0)
        o = lo - want_lo  # xyz offsets
        out[o[2]:o[2] + sub.shape[0], o[1]:o[1] + sub.shape[1],
            o[0]:o[0] + sub.shape[2]] = sub
    return out


class CloudRunFetcher:
    """POST /volume client with identity-token auth + stale-token retry
    (reference generators.py:127-157)."""

    def __init__(self, cloudrun: str, location: str):
        import requests
        self._requests = requests
        self.cloudrun = cloudrun
        self.location = location
        self._headers = {"Content-type": "application/json"}
        self._refresh_token()

    _token_warning_issued = False  # class-level: warn once per process

    def _refresh_token(self):
        try:
            token = subprocess.check_output(
                ["gcloud", "auth", "print-identity-token"],
                stderr=subprocess.DEVNULL).decode()
            self._headers["Authorization"] = f"Bearer {token.rstrip()}"
        except Exception as e:  # noqa: BLE001 — degrade to unauthenticated
            if not CloudRunFetcher._token_warning_issued:
                CloudRunFetcher._token_warning_issued = True
                import warnings
                warnings.warn(
                    "gcloud identity-token acquisition failed "
                    f"({type(e).__name__}: {e}); proceeding unauthenticated "
                    "(fine for local services, will 401/403 on Cloud Run)",
                    RuntimeWarning, stacklevel=2)

    def fetch(self, corner, size: int) -> np.ndarray:
        x, y, z = corner
        config = {"location": self.location,
                  "size": [int(size)] * 3,
                  "start": [int(x), int(y), int(z)]}
        res = self._requests.post(self.cloudrun + "/volume",
                                  data=json.dumps(config),
                                  headers=self._headers)
        if res.status_code != 200:
            # One retry with a fresh token (reference generators.py:147-153
            # retries stale Cloud Run tokens this way).
            self._refresh_token()
            res = self._requests.post(self.cloudrun + "/volume",
                                      data=json.dumps(config),
                                      headers=self._headers)
        if res.status_code != 200:
            body = res.content[:200]
            try:
                body = body.decode("utf-8", "replace")
            except Exception:  # noqa: BLE001
                pass
            raise RuntimeError(
                f"cloud run /volume failed: HTTP {res.status_code} from "
                f"{self.cloudrun} for start={config['start']} "
                f"size={size}: {body!r}")
        data = np.frombuffer(res.content, dtype=np.uint8)
        # service returns F-order xyz == C-order zyx (see serve/data_service)
        return data.reshape((size, size, size))


def volume3d_ng(location: str, bbox: Optional[BBox] = None, size: int = 132,
                seed: Optional[int] = None, array=None,
                cloudrun: Optional[str] = None,
                sample_array: bool = False, sample_class: bool = False,
                num_threads: int = 8, retries: int = 3,
                shard_by_host: bool = False
                ) -> Callable[[], Iterator[np.ndarray]]:
    """Iterator factory over uint8 cubes from ng-precomputed
    (reference generators.py:59-165).

    Transports: local tensorstore (cloudrun=None) or Cloud Run HTTP proxy.
    shard_by_host: derive a per-host seed for multi-host training.
    """
    if shard_by_host:
        seed = host_sharded_seed(seed)
    if cloudrun is None:
        ds = open_tensorstore(location)
        dom_lo = np.asarray(ds.domain.inclusive_min[:3], np.int64)
        dom_hi = np.asarray(ds.domain.exclusive_max[:3], np.int64)

        def fetch(corner):
            # Clamp the read to the volume domain and zero-fill the rest:
            # corner_stream legitimately samples corners whose cube overhangs
            # the bbox/volume edge (see its docstring), and tensorstore
            # raises OutOfRange on any out-of-domain slice (the reference
            # would crash here, generators.py:139-142; the DVID transport
            # zero-fills server-side — this makes the transports' EDGE
            # semantics uniform).
            # KEPT REFERENCE QUIRK — axis orientation: this transport
            # returns the tensorstore read in xyz index order, while the
            # cloudrun transport reshapes the response bytes C-order
            # (== zyx for our data service's byte contract) with NO
            # transpose — exactly the reference's behavior, where the
            # transpose is commented out (generators.py:156
            # `#data = data.transpose((2,1,0))` vs the raw read at :141).
            # Training consumes iid sampled cubes, so a consistent
            # per-transport orientation is benign; just don't switch
            # transports mid-experiment expecting voxel-identical streams.
            want_lo = np.asarray(corner, np.int64)
            want_hi = want_lo + size
            lo = np.maximum(want_lo, dom_lo)
            hi = np.minimum(want_hi, dom_hi)
            if np.any(lo >= hi):
                return np.zeros((size, size, size), np.uint8)
            data = np.asarray(
                ds[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].read().result(),
                np.uint8)
            if np.array_equal(lo, want_lo) and np.array_equal(hi, want_hi):
                return data
            out = np.zeros((size, size, size), np.uint8)
            o = lo - want_lo
            out[o[0]:o[0] + data.shape[0], o[1]:o[1] + data.shape[1],
                o[2]:o[2] + data.shape[2]] = data
            return out
    else:
        fetcher = CloudRunFetcher(cloudrun, location)

        def fetch(corner):
            return fetcher.fetch(corner, size)

    def make_iter() -> Iterator[np.ndarray]:
        corners = corner_stream(bbox, size, seed, array, sample_array,
                                sample_class)
        return _parallel_fetch(corners, with_retries(fetch, retries),
                               num_threads)

    return make_iter
