"""API-parity shim mirroring ``transfer_em.utils`` (reference utils.py).

Reference users import ``predict_ng_cube`` / ``predict_cube_from_saved_model``
/ ``save_model`` from ``transfer_em.utils``; here they live in
``transfer_em_tpu.infer`` — this module re-exports them under the familiar
names.
"""

from .infer.export import predict_cube_from_saved_model, save_model
from .infer.tiling import predict_ng_cube, predict_tiled

__all__ = ["predict_ng_cube", "predict_tiled",
           "predict_cube_from_saved_model", "save_model"]
