"""Volume read backends for the serving layer.

The reference data service reads neuroglancer-precomputed via tensorstore and
returns F-order xyz bytes == C-order zyx bytes (cloudrun_functions/
transferem.py:146-180 documents the order choice at length).  We keep that
contract and add an in-memory/numpy backend so services are testable without
cloud storage.
"""

from __future__ import annotations

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
        self.vol = np.ascontiguousarray(vol_or_path, np.uint8)

    def read(self, start, size) -> np.ndarray:
        x, y, z = start
        sx, sy, sz = size
        out = np.zeros((sz, sy, sx), np.uint8)
        Z, Y, X = self.vol.shape
        z0, z1 = max(0, z), min(Z, z + sz)
        y0, y1 = max(0, y), min(Y, y + sy)
        x0, x1 = max(0, x), min(X, x + sx)
        if z0 < z1 and y0 < y1 and x0 < x1:
            out[z0 - z:z1 - z, y0 - y:y1 - y, x0 - x:x1 - x] = \
                self.vol[z0:z1, y0:y1, x0:x1]
        return out


class TensorstoreVolume(VolumeBackend):
    """ng-precomputed backend (reference cloudrun_functions/transferem.py:131-180)."""

    def __init__(self, location: str, scale_index: int = 0):
        from ..data.sources import open_tensorstore
        self.ds = open_tensorstore(location, scale_index)

    def read(self, start, size) -> np.ndarray:
        x, y, z = start
        sx, sy, sz = size
        data = self.ds[x:x + sx, y:y + sy, z:z + sz].read(order="F").result()
        # F-order xyz buffer reinterpreted as C-order zyx (same RAM contents).
        return np.asarray(data).transpose(2, 1, 0).copy()


_REGISTRY: Dict[str, VolumeBackend] = {}


def register_volume(location: str, backend: VolumeBackend) -> None:
    """Expose a backend under a location string (used by tests/local serving)."""
    _REGISTRY[location] = backend


def open_volume(location: str, scale_index: int = 0) -> VolumeBackend:
    if location in _REGISTRY:
        return _REGISTRY[location]
    if location.endswith(".npy"):
        return NumpyVolume(location)
    return TensorstoreVolume(location, scale_index)
