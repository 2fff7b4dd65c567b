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
from .version import __version__

__all__ = ["shapes", "__version__"]
