"""transfer_em_tpu — TPU-native (JAX/XLA/Pallas/pjit) unpaired EM style
transfer, a ground-up rebuild of janelia-flyem/transfer_em's capabilities.

Public surface mirrors the reference package:

* dataset constructors      -> transfer_em_tpu.data
* model builders            -> transfer_em_tpu.models
* EM2EM train/predict       -> transfer_em_tpu.train.cgan.EM2EM
* tiled inference / export  -> transfer_em_tpu.infer
* serving shims             -> transfer_em_tpu.serve
* debug / eval tools        -> transfer_em_tpu.debug
"""

from . import shapes
from .config import CycleGANConfig, ExportMeta
from .version import __version__

__all__ = ["shapes", "CycleGANConfig", "ExportMeta", "EM2EM", "__version__"]


_LAZY = {
    "EM2EM": ("transfer_em_tpu.train.cgan", "EM2EM"),
    "predict_volume": ("transfer_em_tpu.infer", "predict_volume"),
    "predict_ng_cube": ("transfer_em_tpu.infer.tiling", "predict_ng_cube"),
    "save_model": ("transfer_em_tpu.infer.export", "save_model"),
}


def __getattr__(name):
    # Lazy: importing the train/infer stacks pulls in jax/flax/optax/orbax;
    # keep bare package import light for TF-free clients (serve.client, cli).
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
