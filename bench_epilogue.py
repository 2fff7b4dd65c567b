"""PERF.md lever 4 closure: convT + dropout + LeakyReLU epilogue cost.

The lever proposed a Pallas pass fusing the up-path transposed conv with its
Dropout(0.5) + LeakyReLU epilogue (models/blocks.py UpBlock, reference
utils.py:89-137).  A Pallas kernel cannot fuse INTO an XLA op, so the fused
pass must own the convT itself — and bench_chain.py already measured the
Pallas conv kernel floor at 2.3-2.8x ABOVE lax at batch scale.  The only
remaining question is what the epilogue costs under XLA today: if XLA
already fuses it into the convT (epilogue ~free), the lever has nothing
left to win.  This bench measures exactly that, in-program (fori_loop
chaining, same method as bench_layers.py), at the two real up-layer shapes
of the wf=8 3D generator, B=128 bf16:

  a) convT bare
  b) convT + LeakyReLU                  (inference epilogue)
  c) convT + dropout mask + LeakyReLU   (training epilogue, in-loop RNG)

Usage: python bench_epilogue.py [B]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 30
LEAK = 0.3
DN = ("NDHWC", "DHWIO", "NDHWC")

# (name, in_spatial, Cin, Cout) — the generator's two convT sites (wf=8)
LAYERS = [("up1t 13c32->16", 13, 32, 16),
          ("up0t 22c16->8", 22, 16, 8)]


def convt(x, w):
    return lax.conv_transpose(x, w, (2, 2, 2), "SAME", dimension_numbers=DN,
                              transpose_kernel=False,
                              preferred_element_type=jnp.float32)


def epilogue(kind, y, key):
    if kind in ("train", "train_rbg"):  # Dropout(0.5) mask+scale, LeakyReLU
        keep = jax.random.bernoulli(key, 0.5, y.shape)
        y = jnp.where(keep, y * 2.0, 0.0)
    elif kind in ("train_u8", "train_u8rbg"):
        # p=0.5 from ONE random byte per element (vs bernoulli's 32-bit
        # uniform): 4x fewer RNG words.  128/256 == 0.5 exactly.
        keep = jax.random.bits(key, y.shape, jnp.uint8) < 128
        y = jnp.where(keep, y * 2.0, 0.0)
    if kind != "bare":
        y = jnp.where(y >= 0, y, y * LEAK)
    return y.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("kind", "reps"))
def loop(kind, reps, x, w, key):
    def body(i, carry):
        x, acc = carry
        y = epilogue(kind, convt(x, w), jax.random.fold_in(key, i))
        s = jnp.sum(y, dtype=jnp.float32)
        x = x * (1.0 + 0.0 * s).astype(x.dtype)  # chain: shape-preserving
        return x, acc + s

    x, acc = lax.fori_loop(0, reps, body, (x, jnp.float32(0)))
    return acc


print(f"platform: {jax.default_backend()}  B={B}", file=sys.stderr)
key = jax.random.PRNGKey(0)
for name, sp, ci, co in LAYERS:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, sp, sp, sp, ci))
                    .astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(4, 4, 4, ci, co))
                    .astype(np.float32)).astype(jnp.bfloat16) * 0.05
    rbg_key = jax.random.key(0, impl="rbg")
    row = {}
    for kind in ("bare", "infer", "train", "train_rbg", "train_u8",
                 "train_u8rbg"):
        k = rbg_key if kind.endswith("rbg") else key
        np.asarray(loop(kind, REPS, x, w, k))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(loop(kind, REPS, x, w, k))  # value fetch = barrier
        row[kind] = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: bare {row['bare']:.3f} ms  +leaky {row['infer']:.3f} "
          f"(+{row['infer'] - row['bare']:.3f})  +dropout+leaky "
          f"{row['train']:.3f} (+{row['train'] - row['bare']:.3f})  "
          f"+dropout[rbg]+leaky {row['train_rbg']:.3f} "
          f"(+{row['train_rbg'] - row['bare']:.3f})  "
          f"u8 {row['train_u8']:.3f} (+{row['train_u8'] - row['bare']:.3f})"
          f"  u8rbg {row['train_u8rbg']:.3f} "
          f"(+{row['train_u8rbg'] - row['bare']:.3f})")
