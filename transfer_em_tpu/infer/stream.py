"""Streaming chunked device inference for volumes LARGER than HBM.

The reference's large-volume path (transfer_em/utils.py:87-126) streams
tiles one at a time from the source and never holds the whole volume, so it
handles arbitrarily large requests — slowly.  Our fast paths
(infer/device_stitch.py, infer/slab.py) require the whole uint8 source
resident in HBM (~15 GB ceiling on one v5e chip).  This module closes the
gap: arbitrary-size requests run as a **pipeline of HBM-sized chunks** with
fetch, H2D upload, device compute, and D2H download all overlapped.

Execution model per request:

1. The (padded) output grid is split into chunks of whole output tiles
   (multiples of the effective outdimsize per axis, x innermost), each
   sized so its haloed input block fits ``max_block_bytes``.
2. Every input block is fetched WITH its halo (corner - buffer, extent
   +2*buffer), so the device program needs no safety padding
   (``device_predict_tiled(prepadded=True)``) and chunk results are
   bit-identical to the whole-volume device path — VALID convs see the true
   neighboring voxels across chunk boundaries, zeros outside the source.
3. All chunks share one geometry (edge chunks read zero-filled overhang),
   so ONE compiled program serves the whole request (CLAUDE.md: compiles
   are expensive here).
4. The loop software-pipelines three resources:
     host    : fetch of block k+1 on a worker thread
     PCIe/ICI: async device_put of block k+1, async D2H of result k-1
     TPU     : compute of chunk k
   At most two blocks + two results are in flight, bounding both HBM and
   host RAM (CLAUDE.md: don't queue unbounded un-fetched work).

Equality with the resident device path is asserted in
tests/test_stream.py (tiny volume, tiny budget forcing a multi-chunk grid);
end-to-end throughput is measured by bench_infer.py (PERF.md).
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np

from ..shapes import tile_plan_outdimsize
from .device_stitch import device_predict_tiled


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Static description of one streaming run."""

    start: Tuple[int, int, int]      # requested xyz start
    size: Tuple[int, int, int]       # requested xyz size
    outdimsize: int                  # effective output tile (multiple of 6)
    buffer: int                      # effective halo (incl. folded tpad)
    chunk: Tuple[int, int, int]      # xyz chunk extent (output voxels)
    grid: Tuple[int, int, int]       # xyz chunk counts
    block: Tuple[int, int, int]      # xyz fetched block extent (chunk + 2b)

    @property
    def num_chunks(self) -> int:
        return int(np.prod(self.grid))

    def chunk_xyz(self, k: int) -> Tuple[int, int, int]:
        """Grid coordinates of flat chunk index k (x innermost)."""
        gx, gy, _gz = self.grid
        return (k % gx, (k // gx) % gy, k // (gx * gy))


def plan_chunks(start: Sequence[int], size: Sequence[int], outdimsize: int,
                buffer: int, max_block_bytes: int) -> ChunkPlan:
    """Split an xyz request into equal chunks of whole output tiles.

    Chunks keep x (the fastest-varying axis of the zyx output, hence fetch
    locality) as large as fits, then y, then z; every chunk's haloed uint8
    input block is at most ``max_block_bytes``.
    """
    od, b, _tpad = tile_plan_outdimsize(outdimsize, buffer)
    padded = [-(-s // od) * od for s in size]  # per-axis multiple-of-od

    min_block = (od + 2 * b) ** 3
    if min_block > max_block_bytes:
        raise ValueError(
            f"max_block_bytes={max_block_bytes} cannot hold even one "
            f"{od + 2*b}^3 input tile ({min_block} bytes)")

    def largest_fit(axis_padded: int, others: Tuple[int, ...]) -> int:
        """Largest multiple of od <= axis_padded whose block fits."""
        other_bytes = int(np.prod([o + 2 * b for o in others]))
        c = (max_block_bytes // other_bytes - 2 * b) // od * od
        return max(od, min(axis_padded, c))

    cx = largest_fit(padded[0], (od, od))
    cy = largest_fit(padded[1], (cx, od))
    cz = largest_fit(padded[2], (cx, cy))
    chunk = (cx, cy, cz)
    grid = tuple(-(-p // c) for p, c in zip(padded, chunk))
    block = tuple(c + 2 * b for c in chunk)
    return ChunkPlan(start=tuple(start), size=tuple(size), outdimsize=od,
                     buffer=b, chunk=chunk, grid=grid, block=block)


# One clamp-and-copy implementation repo-wide (also used by the jax-free
# prefork serve.backends workers); re-exported here for its historic home.
from ..native import gather_box  # noqa: E402,F401


def predict_streaming(
        fetch_box: Callable[[Tuple[int, int, int], Tuple[int, int, int]],
                            np.ndarray],
        gen_apply: Callable, params,
        start: Sequence[int], size: Sequence[int],
        outdimsize: int, buffer: int,
        meanstd_x, meanstd_y,
        batch_size: int = 128,
        max_block_bytes: int = 1 << 30,
        mesh=None,
        out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Tiled inference over a source of ANY size via chunk streaming.

    Args:
      fetch_box: (corner_xyz, size_xyz) -> zyx uint8 block, zero-filled
        outside the source (``gather_box`` for host arrays; for remote
        sources wrap ``data.sources.fetch_raw_dvid`` or a tensorstore /
        CloudRun ``/volume`` read the same way).
      gen_apply, params: generator forward — pass a STABLE callable
        (e.g. ``gen.apply``); the compiled chunk program is cached on its
        identity.
      start, size: xyz request, like predict_tiled.
      max_block_bytes: HBM budget for ONE haloed input block.  The pipeline
        holds <= 2 blocks + 2 result chunks on device, so peak HBM is about
        2 * max_block_bytes + 2 * chunk_bytes + model residue.
      mesh: optional Mesh with a "data" axis — each chunk's tile batches
        fan out data-parallel across it.
      out: optional preallocated zyx uint8 output of ``size`` (e.g. a
        np.memmap for outputs larger than host RAM).
    Returns:
      zyx uint8 array of ``size`` (``out`` if given).
    """
    plan = plan_chunks(start, size, outdimsize, buffer, max_block_bytes)
    b = plan.buffer
    cx, cy, cz = plan.chunk
    sx, sy, sz = plan.size

    if out is None:
        out = np.zeros((sz, sy, sx), np.uint8)
    elif out.shape != (sz, sy, sx):
        raise ValueError(f"out shape {out.shape} != request {(sz, sy, sx)}")
    elif out.dtype != np.uint8 or not out.flags.c_contiguous:
        # Same contract as predict_tiled's out=: a float memmap would
        # silently take uint8 casts at 4x the intended bytes.
        raise ValueError("out must be C-contiguous uint8")

    def block_corner(k: int) -> Tuple[int, int, int]:
        i, j, l = plan.chunk_xyz(k)
        return (plan.start[0] + i * cx - b,
                plan.start[1] + j * cy - b,
                plan.start[2] + l * cz - b)

    def fetch(k: int) -> np.ndarray:
        return np.ascontiguousarray(
            fetch_box(block_corner(k), plan.block), np.uint8)

    def compute(block_dev) -> jax.Array:
        # Chunk-local coordinates: the fetched block already holds the halo,
        # so the request starts at (b, b, b) and covers the full chunk; edge
        # overhang was zero-filled by fetch_box.  prepadded skips the
        # device-side safety pad (an extra HBM copy of the block).
        # device_predict_tiled re-derives the same effective (od, b) from
        # the caller's (outdimsize, buffer) via tile_plan_outdimsize.
        return device_predict_tiled(
            block_dev, gen_apply, params, (b, b, b), (cx, cy, cz),
            outdimsize, buffer, meanstd_x, meanstd_y, batch_size=batch_size,
            as_numpy=False, mesh=mesh, prepadded=True)

    def write(k: int, chunk_zyx: np.ndarray):
        i, j, l = plan.chunk_xyz(k)
        ox, oy, oz = i * cx, j * cy, l * cz
        vz, vy, vx = min(cz, sz - oz), min(cy, sy - oy), min(cx, sx - ox)
        out[oz:oz + vz, oy:oy + vy, ox:ox + vx] = chunk_zyx[:vz, :vy, :vx]

    n = plan.num_chunks
    if n == 0:  # zero-extent request: nothing to fetch or compute
        return out
    pending: list[Tuple[int, jax.Array]] = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        block_dev = jax.device_put(fetch(0))
        for k in range(n):
            fut = ex.submit(fetch, k + 1) if k + 1 < n else None
            result = compute(block_dev)  # async dispatch
            try:
                result.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
            pending.append((k, result))
            if fut is not None:
                # H2D of block k+1 overlaps chunk k's compute.
                block_dev = jax.device_put(fut.result())
            if len(pending) > 1:
                j, r = pending.pop(0)
                write(j, np.asarray(r))
        for j, r in pending:
            write(j, np.asarray(r))
    return out


def predict_volume_streaming(vol_zyx: np.ndarray, gen_apply: Callable, params,
                             start, size, meanstd_x, meanstd_y, *,
                             outdimsize: int = 40, buffer: int = 17,
                             batch_size: int = 128,
                             max_block_bytes: int = 1 << 30,
                             mesh=None, out: Optional[np.ndarray] = None
                             ) -> np.ndarray:
    """predict_streaming over a host-resident (possibly memory-mapped) zyx
    uint8 volume — the >HBM analogue of infer.predict_volume."""
    def fetch_box(corner, bsize):
        return gather_box(vol_zyx, corner, bsize)

    return predict_streaming(fetch_box, gen_apply, params, start, size,
                             outdimsize, buffer, meanstd_x, meanstd_y,
                             batch_size=batch_size,
                             max_block_bytes=max_block_bytes, mesh=mesh,
                             out=out)
