"""Generator export / load: the SavedModel + meta.json contract.

Reference utils.py:133-167 ``save_model`` exports generator_g only as a Keras
SavedModel plus a ``meta.json`` with buffer / outdimsize / meanstd_x /
meanstd_y; the AI-Platform predictors load it back (predict_service.py:55-74).

TPU-native equivalent: flax msgpack parameter file (``generator.msgpack``)
plus the same ``meta.json`` keys (we add dimsize/is3d/wf so the model can be
reconstructed without the checkpoint).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import numpy as np
from flax import serialization

from ..config import ExportMeta
from ..models.generator import UNetGenerator

PARAMS_FILE = "generator.msgpack"
META_FILE = "meta.json"


def export_generator(params, meta: ExportMeta, out_dir: str) -> None:
    """Write generator params + meta.json to ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, params)))
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        f.write(meta.to_json())


@functools.lru_cache(maxsize=16)
def generator_module(wf: int) -> UNetGenerator:
    """One module instance per config, so ``gen.apply`` is a STABLE callable:
    the jitted tile step (infer/tiling.py) and the device-stitch runner cache
    compiled programs on gen_apply's identity — a fresh module (hence fresh
    bound method) per request would re-trace and pay the remote-compile
    round trip every call (CLAUDE.md)."""
    return UNetGenerator(wf=wf)


def load_generator(model_dir: str):
    """Load an exported generator: returns (gen_module, params, meta).

    Accepts BOTH export formats:

    * ours — ``generator.msgpack`` + ``meta.json`` (export_generator);
    * the reference's — a Keras SavedModel dir or ``.h5`` file (reference
      utils.py:133-167) with the reference's 4-key ``meta.json`` beside it.
      Converted in place via ``transfer_em_tpu.compat`` (wf and 2D/3D
      inferred from the weights, requires tensorflow), so every serving
      entry point (predict_cube_from_saved_model, the predictors,
      ModelService) runs unmodified on a reference-trained artifact.
    """
    is_file = (model_dir.endswith((".h5", ".keras"))
               and os.path.isfile(model_dir))
    meta_dir = os.path.dirname(model_dir) if is_file else model_dir
    meta = ExportMeta.from_json(
        open(os.path.join(meta_dir, META_FILE)).read())
    params_path = os.path.join(model_dir, PARAMS_FILE)
    if is_file or not os.path.exists(params_path):
        if not is_file and not os.path.exists(
                os.path.join(model_dir, "saved_model.pb")):
            raise FileNotFoundError(
                f"{model_dir!r} contains neither {PARAMS_FILE} (this "
                "package's export) nor saved_model.pb/.h5/.keras (a "
                "reference TF export)")
        import dataclasses

        from ..compat import load_tf_generator, params_geometry
        gen, params = load_tf_generator(model_dir)
        wf, is3d = params_geometry(params)
        meta = dataclasses.replace(meta, wf=wf, is3d=is3d)
        # Re-fetch the cached module so gen.apply stays a stable callable
        # (the docstring above; compat builds a fresh instance).
        return generator_module(gen.wf), params, meta
    gen = generator_module(meta.wf)
    # Shape-only template via eval_shape: building the msgpack deserialization
    # target must NOT run a real 74^3 forward on device (model loads sit on
    # the serving hot path and a real init pays a remote-compile round trip,
    # CLAUDE.md).  Every leaf is overwritten by from_bytes.
    from ..compat import _concretize, _template_params
    template = _concretize(_template_params(gen, meta.is3d, meta.dimsize))
    with open(params_path, "rb") as f:
        params = serialization.from_bytes(template, f.read())
    return gen, params, meta


def save_model(name: str, ckpt_dir: str, meanstd_x: Tuple[float, float],
               meanstd_y: Tuple[float, float], size: int = 74,
               is3d: bool = True, wf: int = 8) -> None:
    """Reconstruct EM2EM from a checkpoint and export generator G
    (reference utils.py:133-167; CLI in cli/save_model.py).

    Note the reference defaults size=132, a stale recipe its own
    VALID_DIMS=[74] rejects (SURVEY.md §7 quirks); we default to 74.
    """
    from ..train.cgan import EM2EM
    model = EM2EM(size, name, is3d=is3d, wf=wf, ckpt_restore=ckpt_dir)
    meta = ExportMeta(buffer=model.buffer, outdimsize=model.outdimsize,
                      meanstd_x=tuple(map(float, meanstd_x)),
                      meanstd_y=tuple(map(float, meanstd_y)),
                      dimsize=size, is3d=is3d, wf=wf)
    export_generator(model.state.gg, meta, name)


def predict_cube_from_saved_model(location: str, start, size, cloudrun: str,
                                  model_dir: str, fetch_input: bool = False,
                                  batch_size: int = 8):
    """Tiled inference from an exported model dir (reference utils.py:12-38)."""
    from .tiling import predict_ng_cube
    gen, params, meta = load_generator(model_dir)
    return predict_ng_cube(
        location, start, size, (gen.apply, params),
        meta.meanstd_x, meta.meanstd_y, cloudrun,
        fetch_input=fetch_input, outdimsize=meta.outdimsize,
        buffer=meta.buffer, batch_size=batch_size)
