"""Layout-amortized conv chain: the decisive measurement (VERDICT r1 item 9).

PERF.md's fast_conv verdict said the Toeplitz kernel's standalone win could
only survive composition if the (B, D, H, W*C) relayout were amortized
across consecutive conv layers.  Before building a fused multi-layer kernel,
this bench measures the BOUND such a chain could reach: the bare Pallas GEMM
pass on a PRE-laid-out input with the output left tangled (`_tconv3_call`) —
i.e. zero relayout cost, the exact per-layer price a perfectly chained
kernel pays (a real chain also saves an HBM round-trip, but it still pays
the same A-build copies and GEMMs from its VMEM ring).

Per chain-candidate layer (the consecutive k3 stride-1 pairs in the
generator are stem->down1a and head->out; down1a and head are the members
with C >= 8 where the strip GEMM can win), at B=128 bf16:

  lax        — lax.conv + LeakyReLU, XLA-fused (production path)
  pal_full   — tconv3(leaky): relayout + GEMM + untangle (fast_conv path)
  pal_kern   — _tconv3_call only: the amortized-chain per-layer bound

All three timed INSIDE one jitted fori_loop (per-call tunnel dispatch is
~28 ms on this rig; see bench_layers.py).  Decision rule: if pal_kern >=
lax on the hot layers, no amount of relayout amortization can make a chain
win — the item closes with a measured negative.  If pal_kern < lax by
>1.3x, build the chained kernel.

Usage: python bench_chain.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from transfer_em_tpu.ops.pallas_conv import (LANE, _build_toeplitz,
                                             _tconv3_call, tconv3,
                                             tconv3_layout)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 30
LEAK = 0.3
DN = ("NDHWC", "DHWIO", "NDHWC")

# (name, in_spatial, Cin, Cout) — generator k3 layers adjacent to another
# k3 layer (chain candidates) with C >= 8.
LAYERS = [
    ("down1a 72c8->8", 72, 8, 8),
    ("head   44c16->16", 44, 16, 16),
]


def _lax_one(x, w):
    y = lax.conv_general_dilated(x, w, (1,) * 3, "VALID",
                                 dimension_numbers=DN,
                                 preferred_element_type=jnp.float32)
    return jnp.where(y >= 0, y, y * LEAK).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("variant", "reps", "c", "o",
                                             "oh", "nw", "od"))
def loop(variant, reps, c, o, oh, nw, od, x, w, bt):
    def body(_, carry):
        x, acc = carry
        if variant == "lax":
            y = _lax_one(x, w)
        elif variant == "pal_full":
            y = tconv3(x, w, leaky=LEAK)
        else:  # pal_kern: input already laid out, output left tangled
            y = _tconv3_call(x, bt, c=c, o=o, oh=oh, nw=nw, od=od,
                             leaky=LEAK)
        s = jnp.sum(y, dtype=jnp.float32)
        x = x * (1.0 + 0.0 * s).astype(x.dtype)  # sequential dependency
        return x, acc + s

    x, acc = lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
    return acc


def timed(variant, c, o, oh, nw, od, x, w, bt):
    a = (variant, 1, c, o, oh, nw, od, x, w, bt)
    b = (variant, REPS, c, o, oh, nw, od, x, w, bt)
    np.asarray(loop(*a))   # warm both programs
    np.asarray(loop(*b))
    t0 = time.perf_counter()
    np.asarray(loop(*b))
    dt_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(loop(*a))
    dt_1 = time.perf_counter() - t0
    return (dt_n - dt_1) / (REPS - 1)


def main():
    results = {}
    worst_bound = 0.0
    for name, sp, ci, co in LAYERS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, sp, sp, sp, ci))
                        .astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, ci, co))
                        .astype(np.float32)).astype(jnp.bfloat16) * 0.05
        wt = LANE // ci - 2
        oh, ow, od = sp - 2, sp - 2, sp - 2
        nw = -(-ow // wt)
        x2 = tconv3_layout(x)
        bt = _build_toeplitz(w, wt)

        row = {}
        for variant, xin in (("lax", x), ("pal_full", x), ("pal_kern", x2)):
            dt = timed(variant, ci, co, oh, nw, od, xin, w, bt)
            row[variant] = round(dt * 1e3, 3)
            print(f"# {name} {variant:9s} {dt*1e3:8.2f} ms", file=sys.stderr,
                  flush=True)
        row["kern_vs_lax"] = round(row["pal_kern"] / row["lax"], 3)
        results[name.split()[0]] = row
        worst_bound = max(worst_bound, row["kern_vs_lax"])

    print(json.dumps({
        "metric": "chain_bound_kern_vs_lax_worst",
        "value": round(worst_bound, 3),
        "unit": "x (pal_kern/lax, <1 means a chain could win)",
        "vs_baseline": None,
        "batch": B,
        "detail": results,
    }))


if __name__ == "__main__":
    main()
