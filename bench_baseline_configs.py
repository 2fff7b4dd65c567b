"""Measure the two BASELINE.md configs not covered by bench.py/bench_infer.py.

Config 2 — 2D inference from a pretrained checkpoint: checkpoint -> export ->
load_generator -> batched 74^2 -> 40^2 tile forwards (the reference's
EM2EM.predict unit, cgan.py:289-293), reported as Mvox/s of output.

Config 4 — 3D training with streaming fetch + augmentation: the full
production path (synthetic volume -> local data service speaking the
reference's Cloud Run /volume contract -> volume3d_ng HTTP source ->
create_dataset_from_generator with warp + augmentation -> EM2EM.train_step),
reported as tiles/s.  On THIS rig the H2D upload rides a ~2.4 MB/s tunnel
(CLAUDE.md), so the number is transfer-bound; the resident-input rate at the
same batch (PERF.md) bounds what a real PCIe host reaches.

Prints one JSON line per config (these are secondary metrics; the driver's
metric is bench.py).

Run: python bench_baseline_configs.py [config2|config4]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

DIM = 74


def config2_2d_inference(batch=256, steps=10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.infer import load_generator, save_model
    from transfer_em_tpu.train import EM2EM

    import shutil
    # a stale checkpoint dir from a crashed run would silently auto-restore
    shutil.rmtree("./checkpoints/train_bench_cfg2", ignore_errors=True)
    try:
        model = EM2EM(DIM, "bench_cfg2", is3d=False, wf=8,
                      compute_dtype="bfloat16")
        model.make_checkpoint(1)
        model.wait_until_finished()
        save_model("bench_cfg2_export",               # pretrained-asset path
                   "./checkpoints/train_bench_cfg2/1", (0.0, 1.0), (0.0, 1.0),
                   size=DIM, is3d=False, wf=8)
        gen, params, meta = load_generator("bench_cfg2_export")
        # serve with bf16 compute on the loaded params, same as bench_infer
        from transfer_em_tpu.models import UNetGenerator
        gen = UNetGenerator(wf=meta.wf, compute_dtype=jnp.bfloat16)

        @jax.jit
        def fwd(params, x):
            return gen.apply(params, x)

        @jax.jit
        def checksum(out):                            # device-side scalar:
            return out.sum(dtype=jnp.float32)         # never fetch the tiles

        rng = np.random.default_rng(0)
        best = (0.0, 0)
        for b in (batch * 16, batch * 64, batch * 128):  # B=65536 hits the
            try:                                         # compile-HBM wall
                x = jnp.asarray(rng.normal(size=(b, DIM, DIM, 1))
                                .astype(np.float32))
                out = fwd(params, x)
                np.asarray(checksum(out))             # compile + warm
                t0 = time.perf_counter()
                for _ in range(steps):
                    # chain each call on the previous output (scalar-
                    # broadcast) so the final fetch forces the sequence
                    out = fwd(params, x + 0.0 * checksum(out))
                np.asarray(checksum(out))             # value-fetch barrier
                dt = time.perf_counter() - t0
            except Exception as e:                    # OOM / compile wall
                print(f"# config2 B={b}: failed ({str(e)[:60]})",
                      file=sys.stderr)
                break
            mvox = steps * b * 40 * 40 / dt / 1e6
            print(f"# config2 B={b}: {mvox:.2f} Mvox/s", file=sys.stderr)
            if mvox > best[0]:
                best = (mvox, b)
        print(json.dumps({"metric": "inference2d_mvox_per_sec", "value":
                          round(best[0], 2), "unit": "Mvox/s",
                          "note": f"config 2: ckpt->export->load, bf16, "
                                  f"B={best[1]}"}))
    finally:
        shutil.rmtree("./checkpoints/train_bench_cfg2", ignore_errors=True)
        # save_model's internal EM2EM also creates this experiment dir
        shutil.rmtree("./checkpoints/train_bench_cfg2_export",
                      ignore_errors=True)
        shutil.rmtree("bench_cfg2_export", ignore_errors=True)


def config4_stream_train(batch=8, epoch_size=32, extent=160):
    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from streaming_training_3d_local import synth_volume

    from transfer_em_tpu.data import (create_dataset_from_generator,
                                      volume3d_ng)
    from transfer_em_tpu.debug import warp
    from transfer_em_tpu.serve.backends import NumpyVolume, register_volume
    from transfer_em_tpu.serve.data_service import DataService
    from transfer_em_tpu.train import EM2EM

    vol = synth_volume(extent=extent)
    register_volume("benchbucket/em", NumpyVolume(vol))
    svc = DataService()
    svc.start()
    try:
        bbox = ((0, 0, 0), (extent,) * 3)
        src_y = volume3d_ng("benchbucket/em", bbox, size=DIM, seed=22,
                            cloudrun=svc.url)
        src_x = volume3d_ng("benchbucket/em", bbox, size=DIM, seed=11,
                            cloudrun=svc.url)
        ds_y, _ = create_dataset_from_generator(
            src_y, batch_size=batch, epoch_size=epoch_size,
            enable_augmentation=True)
        ds_x, _ = create_dataset_from_generator(
            src_x, batch_size=batch, epoch_size=epoch_size,
            custom_map=warp, enable_augmentation=True)
        model = EM2EM(DIM, "bench_cfg4", is3d=True, wf=8,
                      compute_dtype="bfloat16")
        for bx, by in zip(ds_x, ds_y):                # warm epoch: compile,
            losses = model.train_step(bx, by)         # fill prefetch
        np.asarray(losses)
        t0 = time.perf_counter()
        n = 0
        for _ in range(8):                            # timed: 8 epochs, so
            for bx, by in zip(ds_x, ds_y):            # epoch-restart costs
                losses = model.train_step(bx, by)     # (fresh fetch threads,
                n += batch                            # cold prefetch queue)
            np.asarray(losses)                        # are amortized the way
        dt = time.perf_counter() - t0                 # a real run amortizes
        # them; a single 4-batch epoch read 9.3 tiles/s where the sustained
        # rate is ~15 (validate_tpu --stream soak windows).
        print(json.dumps({
            "metric": "stream_train_tiles74_per_sec", "value":
            round(n / dt, 2), "unit": "tiles/s",
            "note": f"config 4: HTTP fetch+warp+augment->train, B={batch}, "
                    "8 epochs; H2D tunnel-bound on this rig (PERF.md)"}))
    finally:
        svc.stop()
        import shutil
        shutil.rmtree("./checkpoints/train_bench_cfg4", ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("config2", "both"):
        config2_2d_inference()
    if which in ("config4", "both"):
        config4_stream_train()
