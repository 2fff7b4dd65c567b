"""Volume read backends for the serving layer.

The reference data service reads neuroglancer-precomputed via tensorstore and
returns F-order xyz bytes == C-order zyx bytes (cloudrun_functions/
transferem.py:146-180 documents the order choice at length).  We keep that
contract and add an in-memory/numpy backend so services are testable without
cloud storage.
"""

from __future__ import annotations

import functools as _functools
from typing import Dict

import numpy as np


class VolumeBackend:
    """read(start_xyz, size_xyz) -> uint8 zyx C-order array."""

    def read(self, start, size) -> np.ndarray:
        raise NotImplementedError


class NumpyVolume(VolumeBackend):
    """Backend over a zyx uint8 array (or .npy path); OOB reads zero-fill."""

    def __init__(self, vol_or_path):
        if isinstance(vol_or_path, str):
            vol_or_path = np.load(vol_or_path)
        # Same uint8-only guard as TensorstoreVolume (and for the same
        # reason): casting another dtype here would wrap mod-256 / truncate
        # floats and serve garbled voxels with no error (round-5 review).
        if np.asarray(vol_or_path).dtype != np.uint8:
            raise ValueError(
                f"NumpyVolume requires uint8 (got "
                f"{np.asarray(vol_or_path).dtype}); the serving byte "
                "contract is uint8-only (reference cloudrun_functions/"
                "transferem.py:146-180)")
        self.vol = np.ascontiguousarray(vol_or_path, np.uint8)

    def read(self, start, size) -> np.ndarray:
        # One clamp-and-copy implementation for the whole repo (native is
        # jax-free, so prefork workers stay jax-free too): a future
        # edge-semantics fix must not have to land twice.
        from ..native import gather_box
        return gather_box(self.vol, start, size)


class TensorstoreVolume(VolumeBackend):
    """ng-precomputed backend (reference cloudrun_functions/transferem.py:131-180).

    OOB reads zero-fill like NumpyVolume (tensorstore itself raises OutOfRange
    on any out-of-domain slice; clients legitimately request halos past the
    volume edge — see data.sources.corner_stream)."""

    def __init__(self, location: str, scale_index: int = 0):
        from ..data.sources import open_tensorstore
        self.ds = open_tensorstore(location, scale_index)
        # The byte contract (and the whole framework — README.md:8-9 "single
        # channel uint8 only") is uint8; assigning another dtype into the
        # zero-filled uint8 buffer would silently truncate mod-256.
        if np.dtype(self.ds.dtype.numpy_dtype) != np.uint8:
            raise ValueError(
                f"volume at {location!r} has dtype {self.ds.dtype}, but the "
                "serving byte contract is uint8-only (reference "
                "cloudrun_functions/transferem.py:146-180)")
        self._lo = np.asarray(self.ds.domain.inclusive_min[:3], np.int64)
        self._hi = np.asarray(self.ds.domain.exclusive_max[:3], np.int64)

    def read(self, start, size) -> np.ndarray:
        # One clamp-and-copy implementation for all tensorstore reads
        # (data.sources.read_ts_box_zyx) — same single-implementation rule
        # as NumpyVolume.read / native.gather_box.
        from ..data.sources import read_ts_box_zyx
        return read_ts_box_zyx(self.ds, start, size, self._lo, self._hi)


_REGISTRY: Dict[str, VolumeBackend] = {}


def register_volume(location: str, backend: VolumeBackend) -> None:
    """Expose a backend under a location string (used by tests/local serving)."""
    _REGISTRY[location] = backend


@_functools.lru_cache(maxsize=16)
def _open_uncached(location: str, scale_index: int) -> VolumeBackend:
    if location.endswith(".npy"):
        return NumpyVolume(location)
    return TensorstoreVolume(location, scale_index)


def open_volume(location: str, scale_index: int = 0) -> VolumeBackend:
    """Resolve a location to a backend; instances are CACHED by
    (location, scale_index).  A serving fleet issues thousands of chunk
    requests against the same volume (the reference's production pattern),
    and the model service previously paid ts.open's blocking remote
    metadata fetch per request while models were carefully LRU-cached
    (round-5 review).  Explicitly registered backends take precedence and
    are never cached here."""
    if location in _REGISTRY:
        return _REGISTRY[location]
    return _open_uncached(location, scale_index)
