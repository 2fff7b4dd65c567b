"""Data-parallel scaling benchmark: DP train step over any device mesh.

The reference never shipped its multi-GPU path (MirroredStrategy TODO,
reference cgan.py:8-11); ours is `parallel.dp.make_dp_train_step`.  This
bench jits that step over meshes of 1, 2, 4, ... N devices on whatever
devices exist and prints, per mesh size:

    tiles/s (global), tiles/s/device, scaling efficiency vs 1 device

plus ONE JSON line for the largest mesh.  One command today on the
simulated CPU mesh, the same command when a real multi-chip slice appears:

    python bench_dp.py --cpu 8        # simulated 8-device CPU mesh
    python bench_dp.py                # all real devices (TPU)
    python bench_dp.py --batch 16 --dim 74 --3d   # bench.py's config

On a single real chip this degenerates to bench.py's measurement (mesh of
one) — the value is that the DP program (batch-sharded jit, psum'd grads)
is the thing being compiled and timed, so chip-count scaling is measured,
not asserted, the day hardware shows up.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="simulate N CPU devices instead of real devices")
    p.add_argument("--batch", type=int, default=0,
                   help="global batch PER DEVICE COUNT unit (default: "
                        "8 for 2D/CPU, 16 for 3D)")
    p.add_argument("--dim", type=int, default=74)
    p.add_argument("--3d", dest="is3d", action="store_true")
    p.add_argument("--wf", type=int, default=0,
                   help="width factor (default: 32 on CPU, 8 on TPU)")
    p.add_argument("--steps", type=int, default=10)
    return p.parse_args()


def main():
    args = parse_args()
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")  # sitecustomize override
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.config import CycleGANConfig
    from transfer_em_tpu.parallel import (make_dp_train_step, make_mesh,
                                          shard_batch, shard_state)
    from transfer_em_tpu.train import create_state

    ndev = jax.device_count()
    on_cpu = jax.devices()[0].platform == "cpu"
    is3d = args.is3d or not on_cpu
    wf = args.wf or (32 if on_cpu else 8)
    per_dev_batch = args.batch or (8 if on_cpu and not args.is3d else 16)
    dtype = "float32" if on_cpu else "bfloat16"

    cfg = CycleGANConfig(dimsize=args.dim, is3d=is3d, wf=wf,
                         compute_dtype=dtype)
    state0 = create_state(cfg, jax.random.PRNGKey(0))
    sp = (args.dim,) * (3 if is3d else 2)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)

    sizes = [1]
    while sizes[-1] * 2 <= ndev:
        sizes.append(sizes[-1] * 2)

    base = None
    result = None
    for n in sizes:
        mesh = make_mesh(n, data=n, space=1)
        B = per_dev_batch * n  # weak scaling: constant per-device work
        x = jnp.asarray(rng.normal(size=(B,) + sp + (1,)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(B,) + sp + (1,)).astype(np.float32))
        step = make_dp_train_step(cfg, mesh, donate=True)
        state = shard_state(jax.tree.map(jnp.copy, state0), mesh)
        xs, ys = shard_batch(x, mesh), shard_batch(y, mesh)

        for _ in range(2):  # warmup (compile)
            state, loss = step(state, xs, ys, key)
        np.asarray(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, loss = step(state, xs, ys, key)
        np.asarray(loss)  # value-fetch barrier (CLAUDE.md)
        dt = time.perf_counter() - t0
        tps = B * args.steps / dt
        if base is None:
            base = tps
        eff = tps / (base * n)
        print(f"# mesh={n:<3d} global_batch={B:<4d} {tps:9.2f} tiles/s "
              f"{tps / n:9.2f} tiles/s/dev  efficiency {eff:6.1%}",
              file=sys.stderr)
        result = {"ndev": n, "tiles_per_sec": tps, "efficiency": eff}

    print(json.dumps({
        "metric": "dp_train_tiles_per_sec",
        "value": round(result["tiles_per_sec"], 3),
        "unit": "tiles/s",
        "vs_baseline": None,
        "ndev": result["ndev"],
        "scaling_efficiency": round(result["efficiency"], 4),
        "config": {"dim": args.dim, "is3d": is3d, "wf": wf,
                   "per_dev_batch": per_dev_batch, "dtype": dtype},
    }))


if __name__ == "__main__":
    main()
