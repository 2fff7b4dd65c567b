"""Prediction-service predictors (AI-Platform custom predictor equivalents).

* ``TransferEMPredictor``: loads an exported generator dir, accepts one
  ``{location, cloudrun, start, size}`` instance, runs tiled inference, and
  returns the volume base64-encoded — reference predict_service.py:14-74.
* ``NgOutputPredictor``: the self-contained variant that additionally writes
  the prediction as neuroglancer-precomputed 64^3 gzip blocks (with an
  ``info`` manifest) under a destination and returns a neuroglancer viewer
  URL — reference custom_online/predictor.py:41-152.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
from typing import List, Optional

import numpy as np

from ..infer.export import load_generator
from ..infer.tiling import predict_ng_cube


class TransferEMPredictor:
    """Base64 predictor (reference predict_service.py).

    ``cross_batch`` (default ON): concurrent ``predict`` calls against this
    predictor share device batches via one lazily-created
    ``infer.TileBatcher`` (see infer/batcher.py — bit-identical results).
    The bound ``self._gen.apply`` also keys the jitted-tile-step cache
    stably across calls (a per-call lambda would retrace every request)."""

    def __init__(self, gen, params, meta, cross_batch: bool = True):
        self._gen = gen
        self._params = params
        self._apply = gen.apply
        self.outdimsize = meta.outdimsize
        self.buffer = meta.buffer
        self.meanstd_x = meta.meanstd_x
        self.meanstd_y = meta.meanstd_y
        self._cross_batch = cross_batch
        self._batcher = None
        import threading
        self._lock = threading.Lock()

    def _get_batcher(self):
        with self._lock:
            # _cross_batch read under the lock: close() clears it there, so
            # a predict() racing close() cannot resurrect a worker thread.
            if not self._cross_batch:
                return None
            if self._batcher is None:
                from ..infer.batcher import make_tile_batcher
                self._batcher = make_tile_batcher(
                    self._apply, self._params, self.meanstd_x,
                    self.meanstd_y, self.outdimsize, self.buffer)
            return self._batcher

    def close(self):
        """Stop the shared batcher's worker thread (idempotent, terminal):
        later predict() calls run unbatched rather than resurrecting a new
        worker thread a caller could never close."""
        with self._lock:
            self._cross_batch = False
            if self._batcher is not None:
                self._batcher.close()
                self._batcher = None

    def _predict_cube(self, inst: dict) -> np.ndarray:
        return predict_ng_cube(
            inst["location"], tuple(inst["start"]), tuple(inst["size"]),
            (self._apply, self._params),
            self.meanstd_x, self.meanstd_y, inst.get("cloudrun"),
            outdimsize=self.outdimsize, buffer=self.buffer,
            batcher=self._get_batcher())

    def predict(self, instances: List[dict], **kwargs) -> List[bytes]:
        """One {location, cloudrun, start, size} instance -> [base64 bytes]."""
        if len(instances) != 1:
            raise RuntimeError("only one instance allowed")
        res = self._predict_cube(instances[0])
        return [base64.b64encode(np.ascontiguousarray(res))]

    @classmethod
    def from_path(cls, model_dir: str, **kwargs) -> "TransferEMPredictor":
        gen, params, meta = load_generator(model_dir)
        return cls(gen, params, meta, **kwargs)


def write_ng_info(dest_dir_or_bucket, size_xyz, write_fn):
    """Write a minimal neuroglancer-precomputed ``info`` manifest
    (reference custom_online/predictor.py:103-127)."""
    info = {
        "@type": "neuroglancer_multiscale_volume",
        "data_type": "uint8",
        "num_channels": 1,
        "scales": [{
            "chunk_sizes": [[64, 64, 64]],
            "encoding": "raw",
            "key": "64_64_64",
            "resolution": [8, 8, 8],
            "size": list(size_xyz),
            "voxel_offset": [0, 0, 0],
        }],
        "type": "image",
    }
    write_fn("info", json.dumps(info).encode())


class NgOutputPredictor(TransferEMPredictor):
    """Predict + publish as an ng volume under a random name, return a viewer
    URL (reference custom_online/predictor.py)."""

    def __init__(self, gen, params, meta, dest_root: str,
                 viewer_base: str = "https://neuroglancer-demo.appspot.com",
                 cross_batch: bool = True):
        super().__init__(gen, params, meta, cross_batch=cross_batch)
        self.dest_root = dest_root
        self.viewer_base = viewer_base

    def predict(self, instances: List[dict], **kwargs) -> List[str]:
        if len(instances) != 1:
            raise RuntimeError("only one instance allowed")
        inst = instances[0]
        vol_zyx = self._predict_cube(inst)

        name = str(uuid.uuid4())
        from .model_service import write_ng_blocks
        dest = os.path.join(self.dest_root, name)
        size_xyz = list(inst["size"])

        if dest.startswith("gs://"):
            from .model_service import BlockWriter
            writer = BlockWriter(dest)
            # info is stored PLAIN (reference custom_online/predictor.py:
            # 126-127 uploads it without gzip), unlike the 64^3 blocks.
            write_ng_info(dest, size_xyz,
                          lambda n, b: writer.write(n, b, compress=False))
            write_ng_blocks(vol_zyx, dest + "/64_64_64", (0, 0, 0))
        else:
            os.makedirs(dest, exist_ok=True)
            write_ng_info(dest, size_xyz,
                          lambda n, b: open(os.path.join(dest, n), "wb").write(b))
            write_ng_blocks(vol_zyx, os.path.join(dest, "64_64_64"), (0, 0, 0))

        source = f"precomputed://{dest}"
        state = {"layers": [{"type": "image", "source": source, "name": name}]}
        url = f"{self.viewer_base}/#!{json.dumps(state, separators=(',', ':'))}"
        return [url]

    @classmethod
    def from_path(cls, model_dir: str, dest_root: Optional[str] = None,
                  **kwargs) -> "NgOutputPredictor":
        gen, params, meta = load_generator(model_dir)
        return cls(gen, params, meta,
                   dest_root or os.environ.get("NG_DEST", "./ng_out"),
                   **kwargs)
