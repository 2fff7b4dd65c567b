"""Clients for the serving endpoints (JAX/TF-free on purpose).

* ``predict_cloud``: Google AI Platform ``projects.predict`` client decoding
  the base64 volume — reference transfer_em/predict_cloud.py:11-52 (gated on
  googleapiclient availability).
* ``fetch_subvolume``: POST /volume client for the data service — reference
  cloudrun_functions/transferem.py:195-251.
* ``predict_chunk``: POST / client for the model service.
"""

from __future__ import annotations

import base64
import json
from typing import Optional

import numpy as np


def predict_cloud(project: str, model: str, location: str, cloudrun: str,
                  start, size, version: Optional[str] = None) -> np.ndarray:
    """Call a deployed predictor and decode the base64 uint8 volume
    (reference predict_cloud.py:11-52).  Requires googleapiclient."""
    import googleapiclient.discovery  # gated
    service = googleapiclient.discovery.build("ml", "v1")
    name = f"projects/{project}/models/{model}"
    if version is not None:
        name += f"/versions/{version}"
    payload = [{"location": location, "cloudrun": cloudrun,
                "start": list(start), "size": list(size)}]
    response = service.projects().predict(
        name=name, body={"instances": payload}).execute()
    if "error" in response:
        raise RuntimeError(response["error"])
    data_str = response["predictions"]
    if isinstance(data_str, str):
        # JSON transports deliver base64 as str; the reference passes it to
        # decodebytes unencoded (predict_cloud.py:50-51), which only accepts
        # bytes — encode first (deliberate fix, behavior otherwise identical).
        data_str = data_str.encode("ascii")
    array = np.frombuffer(base64.decodebytes(data_str), dtype=np.uint8)
    return array.reshape(tuple(reversed(size)))


def fetch_subvolume(service_url: str, location: str, box_zyx,
                    scale_index: int = 0) -> np.ndarray:
    """Fetch a 3D subvolume from the data service; returns zyx C-order
    (reference cloudrun_functions/transferem.py:195-251 example client)."""
    import requests
    box_zyx = np.asarray(box_zyx)
    shape_zyx = box_zyx[1] - box_zyx[0]
    config = {
        "location": location,
        "start": box_zyx[0, ::-1].tolist(),   # service takes xyz
        "size": shape_zyx[::-1].tolist(),
        "scale_index": scale_index,
    }
    r = requests.post(service_url + "/volume", data=json.dumps(config),
                      headers={"Content-type": "application/json"})
    if r.status_code != 200:
        raise RuntimeError(r.content.decode())
    return np.frombuffer(r.content, np.uint8).reshape(tuple(shape_zyx))


def predict_chunk(service_url: str, location: str, start, size, model_name: str,
                  dest: str, glbstart=(0, 0, 0),
                  max_wait_s: float = 300.0) -> None:
    """Ask the model service to predict a 64-aligned chunk and write ng
    blocks to dest (reference model_cloudrun/transferem.py:46-53 contract).

    The service applies admission control (max_inflight): a 503 means "full,
    retry" — this client honors Retry-After up to ``max_wait_s`` total, the
    same behavior Cloud Run's frontend gave the reference's clients when a
    revision hit its concurrency limit."""
    import time

    import requests
    config = {"location": location, "start": list(start),
              "glbstart": list(glbstart), "size": list(size),
              "model_name": model_name, "dest": dest}
    deadline = time.monotonic() + max_wait_s
    while True:
        r = requests.post(service_url + "/", data=json.dumps(config),
                          headers={"Content-type": "application/json"})
        if r.status_code == 200:
            return
        if r.status_code == 503 and time.monotonic() < deadline:
            time.sleep(float(r.headers.get("Retry-After", 1)))
            continue
        raise RuntimeError(r.content.decode())
