"""Serving layer (reference cloudrun_functions/ + model_cloudrun/ +
predict_service.py + custom_online/).

Lazy re-exports (PEP 562): the data-plane modules (``backends``,
``data_service``, ``client``) are jax-free by design — the data service
preforks worker PROCESSES, and forking a jax-loaded process risks deadlock
on inherited locks (CLAUDE.md).  A plain ``from .model_service import ...``
here would drag jax into every ``import transfer_em_tpu.serve.data_service``
even though that submodule never touches it; resolving attributes on demand
keeps the fork-safe modules fork-safe.
"""

import importlib

_EXPORTS = {
    "NumpyVolume": "backends",
    "TensorstoreVolume": "backends",
    "open_volume": "backends",
    "register_volume": "backends",
    "fetch_subvolume": "client",
    "predict_chunk": "client",
    "predict_cloud": "client",
    "DataService": "data_service",
    "LruCache": "data_service",
    "ModelService": "model_service",
    "write_ng_blocks": "model_service",
    "NgOutputPredictor": "predictor",
    "TransferEMPredictor": "predictor",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    try:
        mod = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    return getattr(importlib.import_module(f".{mod}", __name__), name)


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
