"""Device-mesh helpers for DP ("data") and spatial ("space") parallelism.

The reference has no parallelism of any kind (SURVEY.md §2.3): data-parallel
training was an unimplemented TODO (reference cgan.py:8-11, README.md:93-94)
and spatial scale-out was a serial tile loop (utils.py:107-126).  Here both
are first-class mesh axes:

* ``data``  — batch sharding; gradients all-reduce over ICI inside jit.
* ``space`` — spatial sharding of large volumes for halo-exchange inference
  (the CNN analogue of sequence/context parallelism).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
SPACE_Y_AXIS = "space_y"


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              space: int = 1,
              space_y: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, space[, space_y]) mesh over the available devices.

    Defaults: all devices on the data axis.  The product data*space*space_y
    must equal the device count.  ``space_y > 1`` adds a second spatial axis
    for 2-D (z x y) halo decomposition (parallel/halo.py); when it is 1 the
    mesh stays 2-D ("data", "space") for backward compatibility.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        if n % (space * space_y) != 0:
            raise ValueError(
                f"device count {n} not divisible by space={space} "
                f"x space_y={space_y}")
        data = n // (space * space_y)
    if data * space * space_y != n:
        raise ValueError(
            f"data*space*space_y = {data}*{space}*{space_y} != "
            f"device count {n}")
    if space_y > 1:
        arr = np.asarray(devices).reshape(data, space, space_y)
        return Mesh(arr, (DATA_AXIS, SPACE_AXIS, SPACE_Y_AXIS))
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over every mesh axis (data and space both act as
    data parallelism for training)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def space_sharding(mesh: Mesh, ndim_spatial: int) -> NamedSharding:
    """Shard the leading spatial axis of a (batch-less) volume over 'space'."""
    spec = [SPACE_AXIS] + [None] * (ndim_spatial - 1)
    return NamedSharding(mesh, P(*spec))
