"""Secondary benchmark: tiled 3D inference throughput (Mvox/s).

BASELINE.md config 5: large-subvolume tiled inference with VALID-conv
overlap stitching.  Uses the device-resident stitcher (one jitted program:
gather -> preprocess -> generator -> postprocess -> scatter) over an
HBM-resident uint8 volume.

Prints one JSON line {"metric": "tiled_inference_mvox_per_sec", ...}.
(The driver's primary metric stays bench.py's train throughput.)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.infer.slab import slab_predict
    from transfer_em_tpu.models import UNetGenerator

    gen = UNetGenerator(wf=8, compute_dtype=jnp.bfloat16)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    apply_fn = lambda p, x: gen.apply(p, x)

    rng = np.random.default_rng(0)
    # ~47 Mvox request: 360^3 output region from a 400^3 source volume
    size = (360, 360, 360)
    vol = rng.integers(0, 255, size=(400, 400, 400), dtype=np.uint8)
    ms = (0.05, 0.9)

    t0 = time.perf_counter()
    out = slab_predict(vol, apply_fn, params, (20, 20, 20), size, ms, ms)
    warm = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    out = slab_predict(vol, apply_fn, params, (20, 20, 20), size, ms, ms)
    dt = time.perf_counter() - t0
    mvox = out.size / dt / 1e6
    print(f"# warm(compile) {warm:.1f}s, steady {dt:.2f}s", file=sys.stderr)
    print(json.dumps({
        "metric": "tiled_inference_mvox_per_sec",
        "value": round(mvox, 2),
        "unit": "Mvox/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
