from .backends import NumpyVolume, TensorstoreVolume, open_volume, register_volume
from .client import fetch_subvolume, predict_chunk, predict_cloud
from .data_service import DataService, LruCache
from .model_service import ModelService, write_ng_blocks
from .predictor import NgOutputPredictor, TransferEMPredictor

__all__ = [
    "NumpyVolume", "TensorstoreVolume", "open_volume", "register_volume",
    "fetch_subvolume", "predict_chunk", "predict_cloud",
    "DataService", "LruCache", "ModelService", "write_ng_blocks",
    "NgOutputPredictor", "TransferEMPredictor",
]
