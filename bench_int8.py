"""Int8 serving probe: measure, then keep or close (VERDICT r4 weak 5).

v5e's int8 MXU rate is 2x bf16 and the serving path is uint8-in/uint8-out,
so int8 convs (ops/quant.py, ``UNetGenerator(int8_conv=True)``) are the one
unprobed throughput axis.  PERF.md's fusion-loss history (Toeplitz, phase
decomposition — standalone wins, in-context losses) predicts the quant/
dequant epilogues may cost more than the integer MXU saves at wf=8's
overhead-bound widths; this bench records the answer with numbers:

* device-resident tile-step throughput, B=128 wf=8 (the 223 Mvox/s bf16
  serving figure's exact harness) — int8 vs bf16;
* the same at wf=1 (compute-bound ~46% MFU regime, small-B ladder), where
  a 2x MXU rate has room to show;
* fidelity: PSNR vs the frozen TF goldens (tests/goldens/*.npz) with the
  reference weights served through the int8 path — the 40 dB bar decides
  whether int8 is even admissible.

Prints one JSON line: {"metric": "int8_speedup_b128_wf8", ...} with the
throughput ratio (int8 / bf16; > 1.0 means int8 wins) and the fidelity
minimum in the note.

Run: python bench_int8.py            (default platform: the TPU chip)
"""

import json
import os
import signal
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

REPS = 5


def time_step(step, batch, reps=REPS):
    import numpy as np

    # Warm with the EXACT fetch expression the timed region uses: a
    # different indexing op would compile its own program through the
    # remote compile service INSIDE the timed loop (~30 s — the first
    # run of this bench measured exactly that as "bf16 6.6 s/step").
    out = step(batch)
    np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(batch)
    np.asarray(out.ravel()[0])  # value-fetch barrier (CLAUDE.md)
    return (time.perf_counter() - t0) / reps


def main():
    def _timeout(signum, frame):
        print("# bench_int8 watchdog: TPU unresponsive for 40 min",
              file=sys.stderr)
        os._exit(3)

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(40 * 60)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from golden_utils import GEN_ORDER, assign_weights, load_golden, psnr
    from transfer_em_tpu.infer.tiling import make_tile_step
    from transfer_em_tpu.models import UNetGenerator

    ms = (0.05, 0.9)
    rng = np.random.default_rng(0)

    # ---- fidelity: frozen goldens through the int8 path -----------------
    fid = {}
    for tag in ("2d", "3d"):
        x, want, weights = load_golden(f"gen_{tag}")
        gen_q = UNetGenerator(wf=8, int8_conv=True)
        params = gen_q.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = assign_weights(params, GEN_ORDER, weights)
        got = np.asarray(jax.jit(gen_q.apply)(params, jnp.asarray(x)))
        fid[f"gen_{tag}_int8"] = psnr(got, want)
        print(f"# fidelity gen_{tag} int8: {fid[f'gen_{tag}_int8']:.2f} dB "
              "(bar 40)", file=sys.stderr)

    # ---- throughput: the serving tile step, wf=8 B=128 ------------------
    results = {}
    for wf, batches in ((8, (128,)), (1, (4, 8))):
        xinit = jnp.zeros((1, 74, 74, 74, 1), jnp.float32)
        gen_bf = UNetGenerator(wf=wf, compute_dtype=jnp.bfloat16)
        gen_q8 = UNetGenerator(wf=wf, compute_dtype=jnp.bfloat16,
                               int8_conv=True)
        params = gen_bf.init(jax.random.PRNGKey(0), xinit)
        for b in batches:
            tiles = jnp.asarray(rng.integers(
                0, 256, size=(b, 74, 74, 74), dtype=np.uint8))
            vox = b * 36 ** 3
            row = {}
            for name, gen in (("bf16", gen_bf), ("int8", gen_q8)):
                step = make_tile_step(gen.apply, params, ms, ms, tpad=2,
                                      sharding=None)
                dt = time_step(step, tiles)
                row[name] = vox / dt / 1e6
                print(f"# wf={wf} B={b} {name}: {dt*1e3:.1f} ms -> "
                      f"{row[name]:.1f} Mvox/s", file=sys.stderr)
            results[(wf, b)] = row
            print(f"# wf={wf} B={b} int8/bf16 speedup: "
                  f"{row['int8'] / row['bf16']:.3f}x", file=sys.stderr)

    wf8 = results[(8, 128)]
    worst_fid = min(fid.values())
    print(json.dumps({
        "metric": "int8_speedup_b128_wf8",
        "value": round(wf8["int8"] / wf8["bf16"], 3),
        "unit": "x (int8/bf16 device tile-step throughput)",
        "vs_baseline": round(wf8["int8"] / wf8["bf16"], 3),
        "note": (f"bf16 {wf8['bf16']:.1f} vs int8 {wf8['int8']:.1f} Mvox/s; "
                 f"golden PSNR min {worst_fid:.1f} dB (bar 40); "
                 + "; ".join(
                     f"wf1 B={b}: {r['int8']/r['bf16']:.2f}x"
                     for (w, b), r in results.items() if w == 1)),
    }))


if __name__ == "__main__":
    main()
