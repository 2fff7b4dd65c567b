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

Multi-axis spatial decomposition (``y_axis='space_y'``, ``x_axis=
'space_x'``): the second and third spatial axes are additionally sharded
over further mesh axes (make_mesh(space=, space_y=, space_x=)), so a huge
volume splits into a 2-D or full 3-D device grid instead of z-stripes —
the layout when z alone has too few valid slabs for the device count.
Corner/edge halos are handled by exchanging axes sequentially: each later
exchange sends planes of the already-extended block, so diagonal-neighbor
data arrives via the shared edge device in one ppermute round per axis.
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

# halo_predict's per-geometry memo of built shard_map+jit predictors
# (gen_apply and Mesh are both hashable; bounded FIFO).
_FN_CACHE: dict = {}


def _vol_spec(batched: bool, data_axis: str | None,
              space_axes: list[str | None], ndim_spatial: int) -> P:
    """The block's PartitionSpec — shared by shard_map's in/out_specs and
    the dispatch-side device_put so the shardings can never drift apart.

    space_axes: mesh-axis name (or None) per spatial axis, leading first;
    a trailing None covers the channel axis.
    """
    lead = (data_axis,) if batched else ()
    tail = space_axes + [None] * (ndim_spatial - len(space_axes))
    return P(*lead, *tail, None)  # final None: channel axis


def _padded_extent(extent: int, n_dev: int, buffer: int) -> int:
    """Smallest extent' >= extent with a valid slab geometry on n_dev devices
    (slab % 4 == 0, slab > buffer, extended slab a valid dimsize).

    Returns ``extent`` unchanged when it is already valid, so auto-padding
    is a no-op on aligned volumes.
    """
    slab = -(-extent // n_dev)      # ceil-divide
    slab += (-slab) % 4             # round up to the stride-4 pooling phase
    slab = max(slab, 4)
    limit = extent + 4 * n_dev + 512  # geometry search safety bound
    while slab <= buffer or not is_valid_dimsize(slab + 2 * buffer):
        slab += 4
        if slab * n_dev > limit:
            raise ValueError(
                f"no valid slab geometry found for extent {extent} on "
                f"{n_dev} devices with halo {buffer}")
    return slab * n_dev


def _check_slab(extent: int, n_dev: int, buffer: int, name: str) -> None:
    """Validate one sharded spatial axis's per-device slab geometry."""
    if extent % n_dev != 0:
        raise ValueError(
            f"{name} extent {extent} not divisible by its mesh axis {n_dev}")
    slab = extent // n_dev
    if slab % 4 != 0:
        raise ValueError(
            f"{name} slab extent {slab} breaks the stride-4 pooling phase; "
            f"choose an extent with extent/n_devices % 4 == 0")
    if slab <= buffer:
        raise ValueError(f"{name} slab {slab} must exceed halo {buffer}")
    if not is_valid_dimsize(slab + 2 * buffer):
        raise ValueError(
            f"extended {name} slab {slab + 2*buffer} not a valid dimsize")


def _check_extra_axis(mesh: Mesh, axis: str, extent: int | None, buffer: int,
                      pos: int, ndim_spatial: int, name: str) -> int:
    """Validate an additional sharded spatial axis; returns its device count."""
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no '{axis}' axis (got axes "
                         f"{tuple(mesh.shape)}); use "
                         f"parallel.make_mesh(n, space=, space_y=, space_x=)")
    if ndim_spatial < pos + 1:
        raise ValueError(f"{name}_axis needs >= {pos + 1} spatial dims")
    if extent is None:
        raise ValueError(f"{name}_axis requires {name}_extent")
    n_dev = int(mesh.shape[axis])
    _check_slab(extent, n_dev, buffer, name)
    return n_dev


def halo_predict_fn(gen_apply: Callable, mesh: Mesh, buffer: int,
                    z_extent: int, n_space: int | None = None,
                    ndim_spatial: int = 3,
                    batched: bool = False, data_axis: str | None = None,
                    y_axis: str | None = None, y_extent: int | None = None,
                    x_axis: str | None = None, x_extent: int | None = None):
    """Build the jitted sharded predictor.

    Args:
      gen_apply: (params, batch) -> output, the generator forward.
      z_extent: global size of the sharded (leading) spatial axis.
      n_space: devices on the space axis; None (default) derives it from
        the mesh.  If given it must equal ``mesh.shape['space']`` — the
        shard_map splits over the mesh regardless, so a mismatched caller
        value would silently build ppermute rings for the wrong device
        count (zero halos at interior boundaries = corrupt voxels).
      ndim_spatial: 3 for volumes (Z, Y, X, 1), 2 for images (Y, X, 1).
      batched: inputs carry a leading batch axis (B, Z, Y, X, 1) — the
        generator is applied to the whole local batch per shard.
      data_axis: with ``batched``, optionally ALSO shard the batch axis over
        this mesh axis (2-D batch x space sharding, e.g. a ('data', 'space')
        mesh); None replicates the batch across the space axis.
      y_axis / x_axis: optionally ALSO shard the SECOND / THIRD spatial axis
        over these mesh axes (2-D z x y or 3-D z x y x x decomposition;
        make_mesh(space=, space_y=, space_x=)).  Each requires its
        ``*_extent``, validated like the z slab.
    Returns:
      f(params, vol) sharded-axes extents preserved; the remaining
      (unsharded) spatial axes shrink by 2*buffer as usual.
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
    mesh_n = int(mesh.shape[SPACE_AXIS])
    if n_space is None:
        n_space = mesh_n
    elif int(n_space) != mesh_n:
        raise ValueError(
            f"n_space={n_space} != the mesh's '{SPACE_AXIS}' axis size "
            f"{mesh_n}; shard_map splits over the mesh, so the halo "
            f"exchange must be built for exactly that device count")
    _check_slab(z_extent, n_space, buffer, "z")
    # Sharded spatial axes, leading first: (mesh axis name, device count).
    sharded = [(SPACE_AXIS, n_space)]
    if y_axis is not None:
        sharded.append((y_axis, _check_extra_axis(
            mesh, y_axis, y_extent, buffer, 1, ndim_spatial, "y")))
    if x_axis is not None:
        if y_axis is None:
            raise ValueError("x_axis requires y_axis (shard axes in order)")
        sharded.append((x_axis, _check_extra_axis(
            mesh, x_axis, x_extent, buffer, 2, ndim_spatial, "x")))

    zax = 1 if batched else 0  # the first sharded spatial axis in the block

    def exchange(block, axis, mesh_axis, n_dev):
        # Halo exchange along one block axis: neighbors' boundary planes;
        # global edges get zeros (ppermute leaves non-receiving devices
        # with zeros).
        fwd = [(i, i + 1) for i in range(n_dev - 1)]  # send down-edge right
        bwd = [(i + 1, i) for i in range(n_dev - 1)]  # send up-edge left
        n = block.shape[axis]
        hi = lax.slice_in_dim(block, n - buffer, n, axis=axis)
        lo = lax.slice_in_dim(block, 0, buffer, axis=axis)
        upper = lax.ppermute(hi, mesh_axis, fwd)
        lower = lax.ppermute(lo, mesh_axis, bwd)
        return jnp.concatenate([upper, block, lower], axis=axis)

    def local_fn(params, vol_slab):
        # vol_slab: (slab, Y, X, 1) per device ((B_local, slab, ...) batched).
        # Sequential per-axis exchange: each later exchange ships planes of
        # the already-extended block, so corner/edge halos arrive via the
        # shared-edge device — one ppermute round per axis covers diagonals.
        ext = vol_slab
        for i, (mesh_axis, n_dev) in enumerate(sharded):
            ext = exchange(ext, zax + i, mesh_axis, n_dev)
        if batched:
            return gen_apply(params, ext)
        return gen_apply(params, ext[None])[0]

    names = [a for a, _ in sharded]
    vol_spec = _vol_spec(batched, data_axis, names, ndim_spatial)
    f = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), vol_spec),
        out_specs=vol_spec,
        check_vma=False,
    )
    return jax.jit(f)


def halo_predict(gen_apply: Callable, params, vol: jax.Array, mesh: Mesh,
                 buffer: int, batched: bool = False,
                 data_axis: str | None = None,
                 y_axis: str | None = None,
                 x_axis: str | None = None,
                 auto_pad: bool = True) -> jax.Array:
    """One-shot convenience wrapper: shard vol over 'space' and predict.

    vol: (Z, Y, X, 1) volume or (Y, X, 1) image, leading axis sharded —
    or, with ``batched=True``, a batch of them (B, Z, Y, X, 1) where the
    SECOND axis is sharded (and optionally the batch axis too, over
    ``data_axis`` — 2-D batch x space sharding on e.g. a ('data', 'space')
    mesh).  ``y_axis`` / ``x_axis``: also shard the second / third spatial
    axis over those mesh axes (2-D z x y or full 3-D z x y x x spatial
    decomposition, make_mesh(space=, space_y=, space_x=)).

    auto_pad (default True): arbitrary extents on SHARDED axes are accepted
    by zero-padding each to the nearest valid slab geometry and cropping
    the output back — the same zeros-outside-volume semantics the tiled
    paths use (and that edge shards already see beyond the volume), so the
    result is bit-equal to the aligned call on the original extent.  Pass
    ``auto_pad=False`` to keep the strict ValueError behavior.
    """
    n_space = mesh.shape.get(SPACE_AXIS)
    if n_space is None:
        raise ValueError(
            f"halo_predict needs a mesh with a '{SPACE_AXIS}' axis (got axes "
            f"{tuple(mesh.shape)}); use parallel.make_mesh(n, space=...)")
    ndim_spatial = vol.ndim - (2 if batched else 1)
    off = 1 if batched else 0
    if auto_pad:
        # (block axis position, devices on it) per sharded spatial axis;
        # unknown mesh axes are left alone so halo_predict_fn raises its
        # usual diagnostic.
        sharded_pos = [(off, n_space)]
        for i, ax in enumerate((y_axis, x_axis)):
            if ax is not None and ax in mesh.shape and off + 1 + i < off + \
                    ndim_spatial:
                sharded_pos.append((off + 1 + i, int(mesh.shape[ax])))
        pad_widths = [(0, 0)] * vol.ndim
        crops = []
        for pos, n_dev in sharded_pos:
            extent = vol.shape[pos]
            padded = _padded_extent(extent, n_dev, buffer)
            if padded != extent:
                pad_widths[pos] = (0, padded - extent)
                crops.append((pos, extent))
        if crops:
            vol = jnp.pad(vol, pad_widths)
    else:
        crops = []
    z_extent = vol.shape[off]
    y_extent = vol.shape[off + 1] if y_axis is not None else None
    x_extent = vol.shape[off + 2] if x_axis is not None else None
    # Memoize the built shard_map+jit per geometry: rebuilding it every call
    # re-traces the whole generator program (the jit-per-call trap,
    # CLAUDE.md) — seconds of host overhead per volume in a predict loop.
    key = (gen_apply, mesh, buffer, z_extent, n_space, ndim_spatial,
           batched, data_axis, y_axis, y_extent, x_axis, x_extent)
    f = _FN_CACHE.get(key)
    if f is None:
        f = halo_predict_fn(gen_apply, mesh, buffer, z_extent, n_space,
                            ndim_spatial, batched=batched,
                            data_axis=data_axis,
                            y_axis=y_axis, y_extent=y_extent,
                            x_axis=x_axis, x_extent=x_extent)
        if len(_FN_CACHE) >= 32:  # bound retained traces
            _FN_CACHE.pop(next(iter(_FN_CACHE)))
        _FN_CACHE[key] = f
    names = [SPACE_AXIS] + [a for a in (y_axis, x_axis) if a is not None]
    spec = _vol_spec(batched, data_axis, names, ndim_spatial)
    vol = jax.device_put(vol, NamedSharding(mesh, spec))
    out = f(params, vol)
    for pos, extent in crops:
        out = lax.slice_in_dim(out, 0, extent, axis=pos)
    return out
