"""Spatial (halo-exchange) parallel inference — the CNN analogue of SP/CP.

The reference handles large volumes with a *serial* overlap-tile loop
(utils.py:107-126).  Tiles are independent, so the batched path
(infer/tiling.py) already parallelizes trivially; this module adds the true
sharded-volume mode from SURVEY.md §2.3: one huge block is sharded along z
across the ``space`` mesh axis, VALID-conv halos (buffer=17 voxels per face)
are exchanged between neighbor devices with ``lax.ppermute`` over ICI inside
a single ``shard_map``-ped program, and every shard runs the generator on its
extended slab.  No host round-trips, no re-fetch of overlapping halos.

Semantics: ``halo_predict(vol)`` == ``generator(zpad(vol, buffer))`` with
output z-extent equal to vol's (y/x shrink by 2*buffer as usual).  Callers
wanting reference-tiling semantics include real halo data in the first/last
``buffer`` z-planes and crop; edge shards see zeros beyond the volume exactly
like the reference's ZeroPadding in train (cgan.py:160).

Alignment: each shard's slab extent S must keep the global stride-4 pooling
phase, i.e. S % 4 == 0 and (S + 2*buffer) a valid dimsize — checked here,
verified bit-exact vs the unsharded generator in tests/test_parallel.py.

Batched mode (``batched=True``): inputs (B, Z, Y, X, 1) with the SECOND
axis sharded; optionally the batch axis is ALSO sharded over a ``data``
mesh axis (``data_axis='data'``), giving true 2-D batch x space sharding
on a ('data', 'space') mesh — the layout for fleets of large requests.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..shapes import is_valid_dimsize
from .mesh import SPACE_AXIS


def halo_predict_fn(gen_apply: Callable, mesh: Mesh, buffer: int,
                    z_extent: int, n_space: int, ndim_spatial: int = 3,
                    batched: bool = False, data_axis: str | None = None):
    """Build the jitted sharded predictor.

    Args:
      gen_apply: (params, batch) -> output, the generator forward.
      z_extent: global size of the sharded (leading) spatial axis.
      n_space: devices on the space axis.
      ndim_spatial: 3 for volumes (Z, Y, X, 1), 2 for images (Y, X, 1).
      batched: inputs carry a leading batch axis (B, Z, Y, X, 1) — the
        generator is applied to the whole local batch per shard.
      data_axis: with ``batched``, optionally ALSO shard the batch axis over
        this mesh axis (2-D batch x space sharding, e.g. a ('data', 'space')
        mesh); None replicates the batch across the space axis.
    Returns:
      f(params, vol) leading-axis sharded -> other spatial axes shrink by 2b.
    """
    if SPACE_AXIS not in mesh.shape:
        raise ValueError(
            f"halo_predict needs a mesh with a '{SPACE_AXIS}' axis (got axes "
            f"{tuple(mesh.shape)}); use parallel.make_mesh(n, space=...)")
    if data_axis is not None and not batched:
        raise ValueError("data_axis requires batched=True")
    if data_axis is not None and data_axis not in mesh.shape:
        raise ValueError(f"mesh has no '{data_axis}' axis "
                         f"(got axes {tuple(mesh.shape)})")
    if z_extent % n_space != 0:
        raise ValueError(
            f"z extent {z_extent} not divisible by space axis {n_space}")
    slab = z_extent // n_space
    if slab % 4 != 0:
        raise ValueError(
            f"slab extent {slab} breaks the stride-4 pooling phase; choose a "
            f"z extent with z/n_space % 4 == 0")
    if slab <= buffer:
        raise ValueError(f"slab {slab} must exceed halo {buffer}")
    if not is_valid_dimsize(slab + 2 * buffer):
        raise ValueError(f"extended slab {slab + 2*buffer} not a valid dimsize")

    fwd_perm = [(i, i + 1) for i in range(n_space - 1)]   # send down-edge right
    bwd_perm = [(i + 1, i) for i in range(n_space - 1)]   # send up-edge left

    zax = 1 if batched else 0  # the sharded spatial axis within the block

    def local_fn(params, vol_slab):
        # vol_slab: (slab, Y, X, 1) per device ((B_local, slab, ...) batched).
        # Halo exchange: neighbors' boundary planes; global edges get zeros
        # (ppermute leaves non-receiving devices with zeros).
        n = vol_slab.shape[zax]
        hi = lax.slice_in_dim(vol_slab, n - buffer, n, axis=zax)
        lo = lax.slice_in_dim(vol_slab, 0, buffer, axis=zax)
        upper = lax.ppermute(hi, SPACE_AXIS, fwd_perm)
        lower = lax.ppermute(lo, SPACE_AXIS, bwd_perm)
        ext = jnp.concatenate([upper, vol_slab, lower], axis=zax)
        if batched:
            return gen_apply(params, ext)
        return gen_apply(params, ext[None])[0]

    lead = (data_axis,) if batched else ()
    vol_spec = P(*lead, SPACE_AXIS, *([None] * ndim_spatial))  # + channel ax
    f = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), vol_spec),
        out_specs=vol_spec,
        check_vma=False,
    )
    return jax.jit(f)


def halo_predict(gen_apply: Callable, params, vol: jax.Array, mesh: Mesh,
                 buffer: int, batched: bool = False,
                 data_axis: str | None = None) -> jax.Array:
    """One-shot convenience wrapper: shard vol over 'space' and predict.

    vol: (Z, Y, X, 1) volume or (Y, X, 1) image, leading axis sharded —
    or, with ``batched=True``, a batch of them (B, Z, Y, X, 1) where the
    SECOND axis is sharded (and optionally the batch axis too, over
    ``data_axis`` — 2-D batch x space sharding on e.g. a ('data', 'space')
    mesh).
    """
    n_space = mesh.shape.get(SPACE_AXIS)
    if n_space is None:
        raise ValueError(
            f"halo_predict needs a mesh with a '{SPACE_AXIS}' axis (got axes "
            f"{tuple(mesh.shape)}); use parallel.make_mesh(n, space=...)")
    ndim_spatial = vol.ndim - (2 if batched else 1)
    z_extent = vol.shape[1 if batched else 0]
    f = halo_predict_fn(gen_apply, mesh, buffer, z_extent, n_space,
                        ndim_spatial, batched=batched, data_axis=data_axis)
    lead = (data_axis,) if batched else ()
    spec = P(*lead, SPACE_AXIS, *([None] * ndim_spatial))
    vol = jax.device_put(vol, NamedSharding(mesh, spec))
    return f(params, vol)
