"""Secondary benchmark: tiled 3D inference throughput (Mvox/s).

BASELINE.md config 5: large-subvolume inference with VALID-conv overlap
stitching.  Measures the device program over an **HBM-resident** uint8
volume (upload once, predict many — the serving pattern), for both
large-volume modes:

  * slab   (infer/slab.py):          whole (74, Y, X) z-slab forwards
  * device (infer/device_stitch.py): gather->predict->stitch tile scan

and reports the faster as the metric.  Host<->device transfer is timed and
logged separately on stderr: on this remotely-attached chip the tunnel
moves ~15 MB/s (vs GB/s PCIe on a real TPU host), so folding it into the
metric would benchmark the tunnel, not the program (PERF.md methodology).

Each timed call fetches a device-side int32 checksum (value-fetch barrier;
block_until_ready can return early here — see CLAUDE.md).

A third section times the **end-to-end streaming pipeline** (infer/
stream.py: host fetch -> H2D -> compute -> D2H -> stitch, the full path a
>HBM request runs — BASELINE config 5's real scenario) and the host
``tiles`` path on the same request, so the chunked-device-vs-host-loop
comparison is measured, not asserted.  On this rig end-to-end numbers are
tunnel-bound (~15 MB/s); they are reported on stderr + PERF.md, while the
JSON metric stays the device program.  Set ``BENCH_STREAM_GB=4`` to run
the >=4 GB-source variant (memmap source; several minutes of pure tunnel
transfer).

Prints one JSON line {"metric": "tiled_inference_mvox_per_sec", ...}.
(The driver's primary metric stays bench.py's train throughput.)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPS = 3


def bench_stream_e2e(apply_fn, params, ms):
    """End-to-end (fetch->stitch) throughput: stream mode vs host tiles.

    Default: the 400^3 source with a block budget forcing a multi-chunk
    grid.  BENCH_STREAM_GB=N: an N-GB memmap source (>= 4 GB satisfies the
    arbitrary-size obligation; reference utils.py:87-126), stream mode only.
    """
    import numpy as np

    from transfer_em_tpu.infer import predict_volume
    from transfer_em_tpu.infer.tiling import predict_tiled
    from transfer_em_tpu.native import gather_blocks

    gb = float(os.environ.get("BENCH_STREAM_GB", "0"))
    if gb > 0:
        import tempfile
        side = int(round((gb * (1 << 30)) ** (1 / 3) / 64)) * 64
        path = os.path.join(tempfile.gettempdir(), "bench_stream_src.u8")
        vol = np.memmap(path, np.uint8, "w+", shape=(side, side, side))
        tile = (np.arange(64, dtype=np.uint8)[:, None, None]
                + np.arange(64, dtype=np.uint8)[None, None, :])  # (64,1,64)
        plane = np.tile(tile, (1, side, side // 64))  # one 64-deep z-slab
        for z in range(0, side, 64):  # slab-wise: don't hold 4 GB in RAM
            vol[z:z + 64] = plane
        start = (20, 20, 20)
        size = (side - 64,) * 3
        budget = 1 << 30
        print(f"# stream e2e source: {side}^3 memmap "
              f"({vol.nbytes / 2**30:.1f} GB) at {path}", file=sys.stderr)
    else:
        rng = np.random.default_rng(1)
        vol = rng.integers(0, 255, size=(400, 400, 400), dtype=np.uint8)
        start, size = (20, 20, 20), (360, 360, 360)
        budget = 160 * (1 << 20)  # forces a multi-chunk grid

    nvox = int(np.prod(size))
    t0 = time.perf_counter()
    out = predict_volume(vol, apply_fn, params, start, size, ms, ms,
                         mode="stream", max_block_bytes=budget,
                         batch_size=128)
    dt_stream = time.perf_counter() - t0
    print(f"# stream e2e: {dt_stream:.1f}s -> {nvox / dt_stream / 1e6:.1f} "
          f"Mvox/s (fetch+H2D+compute+D2H+stitch, tunnel-bound)",
          file=sys.stderr)

    if gb <= 0:
        def fetch_tile(corner, insize):
            return gather_blocks(vol, [corner], insize)[0]
        t0 = time.perf_counter()
        out_t = predict_tiled(fetch_tile, apply_fn, params, start, size,
                              40, 17, ms, ms, batch_size=128)
        dt_tiles = time.perf_counter() - t0
        print(f"# host tiles e2e: {dt_tiles:.1f}s -> "
              f"{nvox / dt_tiles / 1e6:.1f} Mvox/s", file=sys.stderr)
        np.testing.assert_array_equal(np.asarray(out), out_t)
        print(f"# stream/tiles speedup: {dt_tiles / dt_stream:.2f}x "
              "(bit-identical outputs)", file=sys.stderr)
    return nvox / dt_stream / 1e6


def main():
    import signal

    def _timeout(signum, frame):
        print("# bench_infer watchdog: TPU/tunnel unresponsive for 40 min",
              file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(40 * 60)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.infer import predict_volume
    from transfer_em_tpu.models import UNetGenerator

    # --wf1: the full-width regime (64-512 channels, lanes full — VERDICT
    # r4 weak 3).  Same request, same modes; only the model width changes,
    # so the number is directly comparable to the wf=8 headline.
    wf = 1 if "--wf1" in sys.argv else 8
    gen = UNetGenerator(wf=wf, compute_dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    apply_fn = gen.apply

    rng = np.random.default_rng(0)
    # ~47 Mvox request: 360^3 output region from a 400^3 source volume
    start, size = (20, 20, 20), (360, 360, 360)
    vol_np = rng.integers(0, 255, size=(400, 400, 400), dtype=np.uint8)
    ms = (0.05, 0.9)

    t0 = time.perf_counter()
    vol = jax.device_put(vol_np)
    np.asarray(jnp.sum(vol, dtype=jnp.int32))
    print(f"# upload 64 MB: {time.perf_counter() - t0:.1f}s (tunnel)",
          file=sys.stderr)

    checksum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32))
    nvox = int(np.prod(size))
    best = None
    if wf == 1:
        # Full-width tiles are ~50 MB of activations each (stem 72^3 x 64
        # bf16): probe batch UPWARD in small steps — a straight B=128 would
        # OOM and wedge the tunnel (CLAUDE.md).  Device mode only: the slab
        # forward at 360^2 XY x 64-512 channels exceeds HBM headroom.
        modes = [("device", {"batch_size": b}) for b in (4, 8, 16, 32)]
    else:
        modes = [("slab", {}), ("device", {"batch_size": 128})]
    for mode, kw in modes:
        t0 = time.perf_counter()
        out = predict_volume(vol, apply_fn, params, start, size, ms, ms,
                             mode=mode, as_numpy=False, **kw)
        np.asarray(checksum(out))
        warm = time.perf_counter() - t0  # includes compile
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = predict_volume(vol, apply_fn, params, start, size, ms, ms,
                                 mode=mode, as_numpy=False, **kw)
            np.asarray(checksum(out))
        dt = (time.perf_counter() - t0) / REPS
        mvox = nvox / dt / 1e6
        label = (f"{mode} B={kw['batch_size']}" if "batch_size" in kw
                 else mode)
        print(f"# {label}: warm(compile) {warm:.1f}s, steady {dt:.2f}s "
              f"-> {mvox:.1f} Mvox/s", file=sys.stderr)
        flat = best is not None and mvox < best[1] * 1.02
        if best is None or mvox > best[1]:
            best = (label, mvox)
        if wf == 1 and flat:
            # Ladder flattened: stop before climbing into the OOM wall.
            break

    t0 = time.perf_counter()
    _ = np.asarray(out)
    print(f"# download 46 MB: {time.perf_counter() - t0:.1f}s (tunnel)",
          file=sys.stderr)

    if wf == 8 and os.environ.get("BENCH_STREAM", "1") != "0":
        bench_stream_e2e(apply_fn, params, ms)

    print(json.dumps({
        "metric": ("tiled_inference_mvox_per_sec" if wf == 8
                   else "tiled_inference_mvox_per_sec_wf1"),
        "value": round(best[1], 2),
        "unit": "Mvox/s",
        "vs_baseline": None,
        "note": f"mode={best[0]}, wf={wf}, HBM-resident 360^3 request",
    }))


if __name__ == "__main__":
    main()
