"""Settle the Pallas boundary kernels (VERDICT r1 item 7).

Measures ops/pallas_kernels.py preprocess/postprocess against the jnp
versions in ops/normalize.py, two ways, on the real chip:

1. STANDALONE: the uint8->f32 and f32->uint8 affine passes on a 128x74^3
   tile batch, each jitted alone.  Reports GB/s against the ~v5e HBM
   speed-of-light (~800 GB/s) — these ops are memory-bound, so bandwidth is
   the whole story.
2. IN-PROGRAM: the full tile step (preprocess -> generator wf=8 bf16 ->
   postprocess, the exact shape of infer/tiling.make_tile_step) with jnp
   vs pallas boundaries.  This is the number that decides wiring: if XLA
   already fuses the jnp affines into the adjacent convs, the delta is ~0
   and the jnp path wins on simplicity.

Timing: value-fetch barrier on a device-side checksum (CLAUDE.md:
block_until_ready can return early through the tunnel).

Prints one JSON line; PERF.md records the verdict either way.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPS = 5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.ops import pallas_kernels as pk
    from transfer_em_tpu.ops.normalize import postprocess_to_u8, preprocess_u8

    B, S = 128, 74
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)
    rng = np.random.default_rng(0)
    tiles = jax.device_put(
        rng.integers(0, 255, size=(B, S, S, S), dtype=np.uint8))
    fvals = jax.device_put(
        rng.normal(size=(B, 40, 40, 40, 1)).astype(np.float32))

    def timed(fn, *args):
        out = fn(*args)  # compile
        chk = jnp.sum(out.astype(jnp.float32) if out.dtype == jnp.uint8
                      else out)
        np.asarray(chk)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jnp.sum(
                out.astype(jnp.float32) if out.dtype == jnp.uint8 else out))
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}

    # --- 1. standalone boundary passes -----------------------------------
    pre_jnp = jax.jit(lambda t: preprocess_u8(t, ms_x))
    pre_pal = jax.jit(lambda t: pk.preprocess_u8(t, ms_x))
    post_jnp = jax.jit(lambda y: postprocess_to_u8(y, ms_y))
    post_pal = jax.jit(lambda y: pk.postprocess_u8(y, ms_y))

    nbytes_pre = tiles.size * (1 + 4)       # u8 in, f32 out
    nbytes_post = fvals.size * (4 + 1)
    for name, fn, arg, nb in (("pre_jnp", pre_jnp, tiles, nbytes_pre),
                              ("pre_pallas", pre_pal, tiles, nbytes_pre),
                              ("post_jnp", post_jnp, fvals, nbytes_post),
                              ("post_pallas", post_pal, fvals, nbytes_post)):
        dt = timed(fn, arg)
        gbs = nb / dt / 1e9
        results[name] = {"sec": round(dt, 5), "gb_per_sec": round(gbs, 1)}
        print(f"# {name:12s} {dt*1e3:8.2f} ms  {gbs:7.1f} GB/s",
              file=sys.stderr)

    # --- 2. inside the tile-step program ----------------------------------
    gen = UNetGenerator(wf=8, compute_dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, S, S, S, 1), jnp.float32))

    @jax.jit
    def step_jnp(p, t):
        y = gen.apply(p, preprocess_u8(t, ms_x))
        return postprocess_to_u8(y, ms_y)[..., 0]

    @jax.jit
    def step_pallas(p, t):
        y = gen.apply(p, pk.preprocess_u8(t, ms_x))
        return pk.postprocess_u8(y[..., 0], ms_y)

    a = np.asarray(step_jnp(params, tiles))
    b = np.asarray(step_pallas(params, tiles))
    same = int(np.sum(a != b))
    print(f"# step outputs differ at {same}/{a.size} voxels "
          f"(expect 0; rounding is identical)", file=sys.stderr)

    dt_jnp = timed(step_jnp, params, tiles)
    dt_pal = timed(step_pallas, params, tiles)
    results["step_jnp"] = {"sec": round(dt_jnp, 4)}
    results["step_pallas"] = {"sec": round(dt_pal, 4)}
    speedup = dt_jnp / dt_pal
    print(f"# tile step: jnp {dt_jnp*1e3:.1f} ms  pallas {dt_pal*1e3:.1f} ms "
          f"-> pallas speedup {speedup:.3f}x", file=sys.stderr)

    print(json.dumps({
        "metric": "pallas_boundary_step_speedup",
        "value": round(speedup, 4),
        "unit": "x (jnp/pallas, >1 means pallas wins)",
        "vs_baseline": None,
        "detail": results,
        "mismatch_voxels": same,
    }))


if __name__ == "__main__":
    main()
