"""Reference-named model building blocks (API-parity shim).

The reference exposes ``downsample`` / ``upsample`` / ``InstanceNormalization``
from ``transfer_em/models/utils.py:10-137``; this module gives migrating code
the same import path and signatures over the Flax blocks in ``blocks.py``.

Semantics preserved exactly, including the reference's quirk that the norm
layers are commented out (``models/utils.py:75-82,124-131`` — ``norm_type`` /
``apply_norm`` are accepted but have NO effect there, and therefore none
here either; pass ``use_norm=True`` to the native constructors in
``transfer_em_tpu.models`` if you actually want instance norm).
"""

from __future__ import annotations

from .blocks import DownBlock, InstanceNorm, UpBlock

def InstanceNormalization(is3d=True, epsilon=1e-5) -> InstanceNorm:
    """Reference class name + SIGNATURE (models/utils.py:10-16:
    ``__init__(self, is3d=True, epsilon=1e-5)``; the reference's own call is
    positional ``InstanceNormalization(is3d)``, utils.py:70).

    A thin factory rather than a class alias so that positional migration
    calls bind ``is3d`` — not ``epsilon`` — to the first argument.  ``is3d``
    is inert here: the Flax module infers rank from its input and normalizes
    over whatever spatial axes are present, with the same N(1, 0.02)-scale /
    zero-offset init as the reference.
    """
    del is3d  # inferred from input rank
    return InstanceNorm(epsilon=epsilon)


def downsample(id, infilters, outfilters, is3d=True, filter_size=4,
               norm_type="instancenorm", apply_norm=True) -> DownBlock:
    """3x3 VALID conv -> LeakyReLU (skip tap) -> ``filter_size`` stride-2 VALID
    conv -> LeakyReLU (reference models/utils.py:41-85).

    Returns ONE Flax module whose ``__call__`` yields ``(downsampled, skip)``
    — the same two tensors the reference returns as a pair of weight-sharing
    Keras models.  ``infilters`` is unused (Flax infers input channels);
    ``norm_type``/``apply_norm`` are inert exactly as in the reference.
    """
    del id, infilters, norm_type, apply_norm  # parity-only (see docstring)
    if filter_size != 4:
        raise NotImplementedError(
            "filter_size != 4 (the reference never uses another value; "
            "models/utils.py:41)")
    del is3d  # same module handles 2D/3D
    return DownBlock(features=outfilters)


def upsample(id, infilters, outfilters, is3d=True, filter_size=4,
             norm_type="instancenorm", apply_dropout=True) -> UpBlock:
    """3x3 VALID conv (2x filters) -> LeakyReLU -> ``filter_size`` stride-2
    SAME conv-transpose -> Dropout(0.5) -> LeakyReLU (reference
    models/utils.py:89-137).  Returns the Flax module; ``infilters`` and
    ``norm_type`` are inert as in the reference.
    """
    del id, infilters, norm_type
    if filter_size != 4:
        raise NotImplementedError(
            "filter_size != 4 (the reference never uses another value; "
            "models/utils.py:89)")
    del is3d
    return UpBlock(features=outfilters, apply_dropout=apply_dropout)


__all__ = ["InstanceNormalization", "downsample", "upsample"]
