"""Device-program-only isolation of the cross-request batching win.

PERF.md round 3 found the batching lever's e2e delta drowned in tunnel
weather; the surviving claim — a few large dispatches beat 16 small ones
ON THE DEVICE — was argued, not isolated.  This bench measures exactly
that (VERDICT r3 item 6): the SAME 128 tiles (the fleet case: 16 requests
x 8 tiles of 74^3 each) run through the serving tile step as

  * 16 dispatches of B=8   (unbatched fleet, each request on its own),
  * 2 dispatches of B=64,
  * 1 dispatch of B=128    (what infer.TileBatcher coalesces to),

with all inputs HBM-resident before timing and a scalar on-device
reduction fetched as the barrier — the tunnel appears only as one ~28 ms
constant per run, identical across modes.

Run: python bench_batching_device.py
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

TILES = 128
INSIZE = 74
REPS = 5


def main():
    def _timeout(signum, frame):
        print("# watchdog: TPU/tunnel unresponsive", file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(40 * 60)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.infer.tiling import make_tile_step
    from transfer_em_tpu.models import UNetGenerator

    print(f"# platform: {jax.default_backend()}", file=sys.stderr)
    gen = UNetGenerator(wf=8, compute_dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, INSIZE, INSIZE, INSIZE, 1)))
    step = make_tile_step(gen.apply, params, (0.1, 0.9), (0.2, 1.1), tpad=2)

    rng = np.random.default_rng(0)
    all_tiles = rng.integers(0, 256, size=(TILES,) + (INSIZE,) * 3,
                             dtype=np.uint8)

    def run_mode(batch):
        n = TILES // batch
        # HBM-resident inputs, placed BEFORE timing
        batches = [jax.device_put(jnp.asarray(all_tiles[i * batch:(i + 1)
                                                        * batch]))
                   for i in range(n)]
        jax.block_until_ready(batches)

        def once():
            outs = [step(b) for b in batches]
            s = jnp.stack([o.astype(jnp.int32).sum() for o in outs]).sum()
            return float(np.asarray(s))  # value-fetch barrier

        first = once()  # warm/compile
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            v = once()
            dt = time.perf_counter() - t0
            assert v == first
            best = dt if best is None else min(best, dt)
        del batches
        return best

    results = {}
    for batch in (8, 64, 128):
        dt = run_mode(batch)
        results[batch] = TILES / dt
        print(f"# {TILES // batch} x B={batch}: {dt * 1e3:.1f} ms "
              f"= {TILES / dt:.1f} tiles/s (device program + one fetch)",
              file=sys.stderr)
        signal.alarm(40 * 60)

    print(json.dumps({
        "metric": "device_tiles_per_sec_coalesced_B128",
        "value": round(results[128], 1), "unit": "tiles/s",
        "vs_baseline": round(results[128] / results[8], 3),
        "note": f"same 128 HBM-resident 74^3 tiles; 16xB8 "
                f"{results[8]:.1f}, 2xB64 {results[64]:.1f}, 1xB128 "
                f"{results[128]:.1f} tiles/s; vs_baseline = B128/16xB8"}))


if __name__ == "__main__":
    main()
