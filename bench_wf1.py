"""Full-width (wf=1) train-step regime: find the best operating point.

PERF.md's wf=1 record was a single probe (B=8 plain, 16.9 tiles/s, ~43%
MFU; plain B=16 hit the remote-compile HBM wall).  This bench claims the
regime properly (VERDICT r3 item 2): plain / remat / accum variants with
batch probed upward in small steps, each timed with the value-fetch
barrier.  Prints one JSON line per config plus a FLAGSHIP line.

FLOP accounting (PERF.md "Full-width check"): ~5.1 TF per tile pair at
wf=1; v5e bf16 peak 197 TF/s.

Run: python bench_wf1.py [--quick]
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

DIMSIZE = 74
TF_PER_PAIR = 5.1     # PERF.md FLOP accounting at wf=1
PEAK_TF = 197.0       # v5e bf16


def measure(batch: int, accum: int = 1, remat: bool = False,
            steps: int = 10, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.config import CycleGANConfig
    from transfer_em_tpu.train import create_state, make_train_step

    cfg = CycleGANConfig(dimsize=DIMSIZE, is3d=True, wf=1,
                         compute_dtype="bfloat16", accum_steps=accum,
                         remat=remat)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=True)
    rng = np.random.default_rng(0)
    shape = (batch, DIMSIZE, DIMSIZE, DIMSIZE, 1)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    key = jax.random.PRNGKey(1)

    for _ in range(warmup):
        state, loss = step(state, x, y, key)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, x, y, key)
    np.asarray(loss)  # value-fetch barrier (CLAUDE.md)
    dt = time.perf_counter() - t0
    del state, x, y
    return batch * steps / dt


def main():
    def _timeout(signum, frame):
        print("# wf1 watchdog: TPU/tunnel unresponsive", file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(40 * 60)

    quick = "--quick" in sys.argv
    # Probe order: cheap-known first, then upward in small steps (a too-big
    # program can wedge the compile service — CLAUDE.md; never jump far).
    configs = [
        dict(batch=8, accum=1, remat=False),   # PERF.md baseline probe
        dict(batch=8, accum=1, remat=True),
        dict(batch=16, accum=2, remat=False),  # micro 8: compiles like B=8
        dict(batch=10, accum=1, remat=False),
        dict(batch=12, accum=1, remat=False),
        dict(batch=12, accum=1, remat=True),
        dict(batch=24, accum=2, remat=False),  # micro 12
    ]
    if quick:
        configs = configs[:3]

    results = []
    for c in configs:
        tag = (f"B={c['batch']}"
               + (f" accum={c['accum']}" if c["accum"] > 1 else "")
               + (" remat" if c["remat"] else ""))
        try:
            tps = measure(**c)
        except Exception as e:
            msg = str(e).lower()
            oom = ("resource" in msg and "exhausted" in msg
                   or "out of memory" in msg or "oom" in msg
                   or "remote_compile" in msg)
            print(json.dumps({"config": tag, "error": msg[:120],
                              "oom_like": oom}))
            if not oom:
                raise
            continue
        mfu = tps * TF_PER_PAIR / PEAK_TF
        results.append((tag, tps, mfu))
        print(json.dumps({"config": tag, "tiles_per_sec": round(tps, 2),
                          "mfu_pct": round(100 * mfu, 1)}))
        signal.alarm(40 * 60)  # progress: re-arm

    if results:
        tag, tps, mfu = max(results, key=lambda r: r[1])
        print(json.dumps({"FLAGSHIP_wf1": tag,
                          "tiles_per_sec": round(tps, 2),
                          "mfu_pct": round(100 * mfu, 1)}))


if __name__ == "__main__":
    main()
