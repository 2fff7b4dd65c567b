"""Per-layer timing of the 3D generator forward at inference batch sizes.

Times each conv stage with the repeat loop INSIDE one jitted program
(fori_loop chaining through the input) so per-call tunnel dispatch latency
(~28 ms on this rig) does not contaminate ~ms-scale layer times.

Usage: python bench_layers.py [B]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 30
LEAK = 0.3

DN = ("NDHWC", "DHWIO", "NDHWC")


def act(y):
    return jnp.where(y >= 0, y, y * LEAK).astype(jnp.bfloat16)


# (name, in_spatial, Cin, Cout, kind)
LAYERS = [
    ("stem   74c1->8 k3", 74, 1, 8, "k3"),
    ("down1a 72c8->8 k3", 72, 8, 8, "k3"),
    ("down1b 70c8->8 s2k4", 70, 8, 8, "s2"),
    ("down2a 34c8->16 k3", 34, 8, 16, "k3"),
    ("down2b 32c16->16 s2k4", 32, 16, 16, "s2"),
    ("up1a   15c16->32 k3", 15, 16, 32, "k3"),
    ("up1t   13c32->16 t2k4", 13, 32, 16, "t2"),
    ("mid    26c32->32 k3", 26, 32, 32, "k3"),
    ("up0a   24c32->16 k3", 24, 32, 16, "k3"),
    ("up0t   22c16->8 t2k4", 22, 16, 8, "t2"),
    ("head   44c16->16 k3", 44, 16, 16, "k3"),
    ("out    42c16->1 k3", 42, 16, 1, "k3"),
]


def one(kind, x, w):
    if kind == "k3":
        return act(lax.conv_general_dilated(
            x, w, (1,) * 3, "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32))
    if kind == "s2":
        return act(lax.conv_general_dilated(
            x, w, (2,) * 3, "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32))
    y = lax.conv_transpose(x, w, (2, 2, 2), "SAME", dimension_numbers=DN,
                           transpose_kernel=False,
                           preferred_element_type=jnp.float32)
    return act(y)


@functools.partial(jax.jit, static_argnames=("kind", "reps"))
def loop(kind, reps, x, w):
    def body(_, carry):
        x, acc = carry
        y = one(kind, x, w)
        s = jnp.sum(y, dtype=jnp.float32)
        # fold scalar back into x: keeps shape, forces sequential dependency
        x = x * (1.0 + 0.0 * s).astype(x.dtype)
        return x, acc + s

    x, acc = lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
    return acc


total = 0.0
rows = []
for name, sp, ci, co, kind in LAYERS:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, sp, sp, sp, ci)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = 4 if kind in ("s2", "t2") else 3
    w = jnp.asarray(rng.normal(size=(k, k, k, ci, co)).astype(np.float32)
                    ).astype(jnp.bfloat16) * 0.05
    try:
        np.asarray(loop(kind, 1, x, w))      # warm both programs
        np.asarray(loop(kind, REPS, x, w))
        t0 = time.perf_counter()
        np.asarray(loop(kind, REPS, x, w))
        dt_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(loop(kind, 1, x, w))
        dt_1 = time.perf_counter() - t0
        dt = (dt_n - dt_1) / (REPS - 1)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        continue
    total += dt
    rows.append((name, dt))
    print(f"{name}: {dt*1e3:8.2f} ms", flush=True)

print(f"\nsum of layers: {total*1e3:.1f} ms (B={B})")
for name, dt in sorted(rows, key=lambda r: -r[1]):
    print(f"  {100*dt/total:5.1f}%  {name}")
