"""Serving-fleet benchmark: concurrent 64-aligned chunk requests through the
real ModelService HTTP path, cross-request batching OFF vs ON.

The reference's production scale-out is a fan-out of many small concurrent
chunk requests against one cached model (model_cloudrun/transferem.py:66-73,
each request predicting its 64^3 chunk on its own).  Independently served,
each request runs tiny device batches (8 tiles of 74^3 per 64^3 chunk);
``infer.TileBatcher`` (ModelService default) coalesces concurrent requests'
tiles into shared device batches.  This bench measures the END-TO-END fleet
wall time — HTTP in, host fetch, H2D, predict, D2H, gzip ng-block write —
for the same fleet with ``cross_batch`` off and on, on the real chip.

Caveat (same as bench_infer's stream section): on this rig every device
transfer rides a ~15 MB/s tunnel with ~28 ms/call latency, so e2e numbers
under-state a real TPU host; the tunnel cost is IDENTICAL in both modes, so
the delta isolates what batching buys (dispatch count + device batch size).

Prints one JSON line {"metric": "serve_fleet_mvox_per_sec", ...} where the
value is the batched mode and vs_baseline is the speedup over unbatched.
"""

import concurrent.futures as cf
import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPS = 3
N_REQ = int(os.environ.get("BENCH_SERVE_REQS", "16"))
CHUNK = 64


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.config import ExportMeta
    from transfer_em_tpu.infer.export import export_generator
    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.serve import (ModelService, NumpyVolume,
                                       predict_chunk, register_volume)

    log(f"platform: {jax.default_backend()}  devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(256, 256, 256), dtype=np.uint8)
    register_volume("benchbucket/vol", NumpyVolume(vol))

    gen = UNetGenerator(wf=8)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    meta = ExportMeta(buffer=17, outdimsize=40, meanstd_x=(0.1, 0.9),
                      meanstd_y=(0.2, 1.1), dimsize=74, is3d=True, wf=8)
    root = tempfile.mkdtemp(prefix="bench_serve_")
    os.makedirs(os.path.join(root, "m"))
    export_generator(params, meta, os.path.join(root, "m", "v"))

    # N_REQ disjoint 64-aligned chunk starts inside the volume (at most
    # per_dim^3 fit; clamp rather than request beyond the volume's extent).
    per_dim = 256 // CHUNK
    n_req = min(N_REQ, per_dim ** 3)
    if n_req < N_REQ:
        log(f"clamping BENCH_SERVE_REQS {N_REQ} -> {n_req} "
            f"(only {per_dim}^3 disjoint chunks fit in 256^3)")
    starts = [(CHUNK * (i % per_dim), CHUNK * ((i // per_dim) % per_dim),
               CHUNK * (i // per_dim ** 2)) for i in range(n_req)]
    vox = n_req * CHUNK ** 3

    def run_fleet(svc, tag):
        dest_root = tempfile.mkdtemp(prefix="bench_serve_out_")
        try:
            def req(i):
                predict_chunk(svc.url, "benchbucket/vol", start=starts[i],
                              size=(CHUNK,) * 3, model_name="m:v",
                              dest=os.path.join(dest_root, str(i)))
            t0 = time.perf_counter()
            with cf.ThreadPoolExecutor(max_workers=n_req) as ex:
                list(ex.map(req, range(n_req)))
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(dest_root, ignore_errors=True)

    results = {}
    for tag, kwargs in (("unbatched", dict(cross_batch=False)),
                        ("batched", dict(cross_batch=True))):
        svc = ModelService(model_root=root, **kwargs)
        svc.start()
        try:
            warm = run_fleet(svc, tag)  # compiles + caches program shapes
            log(f"{tag}: warmup fleet {warm:.2f}s")
            times = [run_fleet(svc, tag) for _ in range(REPS)]
            best = min(times)
            results[tag] = best
            log(f"{tag}: fleet of {n_req} x {CHUNK}^3 best {best:.2f}s "
                f"({vox / best / 1e6:.1f} Mvox/s e2e)  all={['%.2f' % t for t in times]}")
            if kwargs["cross_batch"]:
                import urllib.request
                s = json.loads(
                    urllib.request.urlopen(svc.url + "/stats").read())
                log(f"batcher stats: {s['batcher']}")
        finally:
            svc.stop()
    shutil.rmtree(root, ignore_errors=True)

    mvox = vox / results["batched"] / 1e6
    speedup = results["unbatched"] / results["batched"]
    print(json.dumps({"metric": "serve_fleet_mvox_per_sec",
                      "value": round(mvox, 2), "unit": "Mvox/s",
                      "vs_baseline": round(speedup, 3)}))


if __name__ == "__main__":
    main()
