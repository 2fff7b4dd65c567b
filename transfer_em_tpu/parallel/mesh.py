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
SPACE_X_AXIS = "space_x"


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              space: int = 1,
              space_y: int = 1,
              space_x: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, space[, space_y[, space_x]]) mesh over the devices.

    Defaults: all devices on the data axis.  The products of all axis sizes
    must equal the device count.  ``space_y``/``space_x`` > 1 add second and
    third spatial axes for 2-D (z x y) or 3-D (z x y x x) halo decomposition
    (parallel/halo.py); size-1 trailing axes are omitted so existing
    ("data", "space") meshes keep their shape.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    prod = space * space_y * space_x
    if data is None:
        if n % prod != 0:
            raise ValueError(
                f"device count {n} not divisible by space={space} "
                f"x space_y={space_y} x space_x={space_x}")
        data = n // prod
    if data * prod != n:
        raise ValueError(
            f"data*space*space_y*space_x = {data}*{space}*{space_y}"
            f"*{space_x} != device count {n}")
    sizes = [data, space]
    names = [DATA_AXIS, SPACE_AXIS]
    if space_y > 1 or space_x > 1:
        sizes.append(space_y)
        names.append(SPACE_Y_AXIS)
    if space_x > 1:
        sizes.append(space_x)
        names.append(SPACE_X_AXIS)
    arr = np.asarray(devices).reshape(*sizes)
    return Mesh(arr, tuple(names))


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
