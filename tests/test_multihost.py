"""Two-process multi-host DP training on CPU (VERDICT round 1 item 3).

Spawns two REAL Python processes, each with 2 simulated CPU devices, joined
by ``parallel.distributed.initialize`` (jax.distributed + gloo CPU
collectives) into one 4-device global mesh.  Asserts:

* ``dp.host_local_batch`` assembles the global batch from per-host shards
  (each process passes only its 4 of 8 rows);
* one DP train step agrees with the single-process step on the same global
  batch (losses AND updated params);
* ``sources.host_sharded_seed`` ROI streams are disjoint between hosts but
  reproducible (harness re-derives both streams from the seed formula);
* an orbax checkpoint of the meshed state saves from BOTH processes and
  restores bit-equal with the live shardings (multi-process save is where
  orbax + sharded arrays differ from the single-process path).

This is the first executed coverage of parallel/distributed.py:23-55 — the
multi-host path SURVEY §2.3 names as a first-class obligation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu

pid = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]

sys.path.insert(0, {repo!r})
from transfer_em_tpu.config import CycleGANConfig
from transfer_em_tpu.data.sources import corner_stream, host_sharded_seed
from transfer_em_tpu.parallel import make_mesh
from transfer_em_tpu.parallel.dp import host_local_batch, make_dp_train_step
from transfer_em_tpu.parallel.distributed import barrier, initialize, process_info
from transfer_em_tpu.train import create_state

initialize("127.0.0.1:" + port, num_processes=2, process_id=pid)
assert process_info() == (pid, 2, 2), process_info()
assert jax.device_count() == 4

import jax.numpy as jnp
cfg = CycleGANConfig(dimsize=74, is3d=False, wf=32)
state = create_state(cfg, jax.random.PRNGKey(0))  # same on both hosts
mesh = make_mesh(4)

# Global batch rows 0..7; this host contributes rows [pid*4, pid*4+4)
# (mesh device order = process order for the leading 'data' axis).
rng = np.random.default_rng(7)
gx = rng.normal(size=(8, 74, 74, 1)).astype(np.float32)
gy = rng.normal(size=(8, 74, 74, 1)).astype(np.float32)
x = host_local_batch(gx[pid * 4:pid * 4 + 4], mesh)
y = host_local_batch(gy[pid * 4:pid * 4 + 4], mesh)
assert x.shape == (8, 74, 74, 1), x.shape  # GLOBAL shape from local shards

# host_local_batch round-trip: the addressable shards hold this host's rows.
for shard in x.addressable_shards:
    np.testing.assert_array_equal(
        np.asarray(shard.data), gx[shard.index[0]])

# AOT-compile, then rendezvous: the gloo clique init at the FIRST collective
# execution has a hard ~30s window, which compile-time skew between the two
# processes can blow (observed under suite load); the coordination-service
# barrier (long timeout, no collectives) removes the skew.
step = make_dp_train_step(cfg, mesh, donate=False)
compiled = step.lower(state, x, y, jax.random.PRNGKey(1)).compile()
barrier("mh_step_ready")
new_state, loss = compiled(state, x, y, jax.random.PRNGKey(1))

# ROI streams: per-host seed -> first 5 corners.
seed = host_sharded_seed(42)
corners = [c for c, _ in zip(
    corner_stream(((0, 0, 0), (100, 100, 100)), 74, seed), range(5))]

# Multi-process orbax checkpoint round-trip: BOTH processes participate in
# the save (orbax coordinates via the jax.distributed client), then restore
# with the live shardings and compare the locally-addressable data.
import orbax.checkpoint as ocp
mgr = ocp.CheckpointManager(os.path.join(outdir, "mh_ckpt"))
mgr.save(1, args=ocp.args.StandardSave(new_state))
mgr.wait_until_finished()
barrier("mh_ckpt_saved")
abstract = jax.tree.map(
    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
    new_state)
restored = mgr.restore(1, args=ocp.args.StandardRestore(abstract))
ok = True
for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(restored)):
    if a.shape != b.shape or a.sharding != b.sharding:
        ok = False
        break
    if not np.array_equal(np.asarray(a.addressable_shards[0].data),
                          np.asarray(b.addressable_shards[0].data)):
        ok = False
        break
mgr.close()

# --- cross-process halo inference: the ppermute ring spans the process
# boundary (device 1 on host 0 <-> device 2 on host 1 — the DCN-shaped
# risk).  Each host checks its ADDRESSABLE output shards against the
# locally computed unsharded reference; the shard interior within
# ``buffer`` planes of the boundary depends on the OTHER process's data,
# so a zero/wrong halo shipped across the boundary cannot pass.
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.ops.convs import zero_pad
from transfer_em_tpu.parallel import halo_predict
from transfer_em_tpu.shapes import generator_shapes

gen = UNetGenerator(wf=32)
buffer = generator_shapes(74).buffer  # 17
slab = 20  # 2D image (Z, 74, 1); slab % 4 == 0, slab + 34 = 54 valid
vrng = np.random.default_rng(21)
vol = vrng.normal(size=(4 * slab, 74, 1)).astype(np.float32)  # same both hosts
gparams = gen.init(jax.random.PRNGKey(3), jnp.asarray(vol[None, :74]))
smesh = make_mesh(4, data=1, space=4)
barrier("mh_halo_ready")
out = halo_predict(lambda p, b: gen.apply(p, b), gparams, jnp.asarray(vol),
                   smesh, buffer)
padded = zero_pad(jnp.asarray(vol)[None], buffer)[:, :, buffer:-buffer]
want = np.asarray(gen.apply(gparams, padded)[0])  # (80, 40, 1), z-pad only
halo_max_diff, halo_shards = 0.0, 0
for shard in out.addressable_shards:
    got = np.asarray(shard.data)
    ref = want[shard.index]
    halo_max_diff = max(halo_max_diff, float(np.max(np.abs(got - ref))))
    halo_shards += 1

# --- shard_by_host streaming sources feeding the SAME compiled DP step:
# each host pulls its own disjoint reproducible ROI stream from a shared
# ng-precomputed volume and contributes its local rows; both hosts must
# then compute the SAME global loss (verified against a single-device
# reconstruction by the harness).
from transfer_em_tpu.data import create_dataset_from_generator
from transfer_em_tpu.data.sources import volume3d_ng

ngdir = os.path.join(outdir, "ngvol")
if pid == 0:
    import tensorstore as tsm
    vdata = np.random.default_rng(17).integers(
        0, 256, size=(128, 128, 128), dtype=np.uint8)  # xyz
    spec = {{"driver": "neuroglancer_precomputed",
            "kvstore": {{"driver": "file", "path": ngdir}},
            "create": True,
            "schema": {{"dtype": "uint8",
                       "domain": {{"shape": [128, 128, 128, 1]}},
                       "chunk_layout": {{"chunk": {{
                           "shape": [128, 128, 128, 1]}}}}}}}}
    w = tsm.open(spec).result()
    w[...] = vdata[..., None]
barrier("mh_ngvol_ready")
src = volume3d_ng("file://" + ngdir, bbox=((0, 0, 0), (54, 54, 54)), size=74,
                  seed=42, shard_by_host=True, num_threads=2)
sds, _ = create_dataset_from_generator(
    src, batch_size=4, epoch_size=8, meanstd=(0.0, 1.0),
    enable_augmentation=False, fetch_threads=0)
bx, by = sds.take_batches(2)            # (4, 74, 74, 74, 1) float32 each
bx = np.asarray(bx)[:, 37]              # mid-plane -> (4, 74, 74, 1): reuse
by = np.asarray(by)[:, 37]              # the already-compiled 2D DP step
sx = host_local_batch(bx, mesh)
sy = host_local_batch(by, mesh)
barrier("mh_stream_ready")
_, stream_loss = compiled(state, sx, sy, jax.random.PRNGKey(2))

result = {{
    "pid": pid,
    "loss": np.asarray(loss).tolist(),
    "stem_sum": float(np.abs(np.asarray(
        new_state.gg["params"]["stem"]["kernel"])).sum()),
    "seed": seed,
    "corners": corners,
    "ckpt_roundtrip_ok": ok,
    "halo_max_diff": halo_max_diff,
    "halo_shards": halo_shards,
    "stream_loss": np.asarray(stream_loss).tolist(),
    "stream_x_sum": float(np.abs(bx).sum()),
    "stream_y_sum": float(np.abs(by).sum()),
}}
with open(os.path.join(outdir, "result_%d.json" % pid), "w") as f:
    json.dump(result, f)
print("WORKER_OK", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for pid in (0, 1):
        with open(tmp_path / f"result_{pid}.json") as f:
            results[pid] = json.load(f)

    # Multi-process checkpoint round-trip succeeded on both hosts.
    assert results[0]["ckpt_roundtrip_ok"] and results[1]["ckpt_roundtrip_ok"]

    # Both hosts computed the SAME global step (losses + params agree).
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"],
                               rtol=1e-5, atol=1e-6)
    assert results[0]["stem_sum"] == pytest.approx(results[1]["stem_sum"],
                                                   rel=1e-6)

    # ... and it equals the single-process step on the same global batch.
    import jax
    import jax.numpy as jnp
    from transfer_em_tpu.config import CycleGANConfig
    from transfer_em_tpu.train import create_state, make_train_step

    cfg = CycleGANConfig(dimsize=74, is3d=False, wf=32)
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    gx = rng.normal(size=(8, 74, 74, 1)).astype(np.float32)
    gy = rng.normal(size=(8, 74, 74, 1)).astype(np.float32)
    step = make_train_step(cfg, donate=False)
    s1, l1 = step(state, jnp.asarray(gx), jnp.asarray(gy),
                  jax.random.PRNGKey(1))
    np.testing.assert_allclose(results[0]["loss"], np.asarray(l1),
                               rtol=5e-4, atol=1e-5)
    want_stem = float(np.abs(np.asarray(
        s1.gg["params"]["stem"]["kernel"])).sum())
    assert results[0]["stem_sum"] == pytest.approx(want_stem, rel=1e-4)

    # ROI streams: disjoint between hosts, reproducible from the formula.
    from transfer_em_tpu.data.sources import corner_stream
    assert results[0]["seed"] == 42 * 1_000_003 + 0
    assert results[1]["seed"] == 42 * 1_000_003 + 1
    c0, c1 = results[0]["corners"], results[1]["corners"]
    assert not any(tuple(a) == tuple(b) for a in c0 for b in c1)
    for pid in (0, 1):
        want = [c for c, _ in zip(
            corner_stream(((0, 0, 0), (100, 100, 100)), 74,
                          results[pid]["seed"]), range(5))]
        assert [tuple(c) for c in results[pid]["corners"]] == want

    # Cross-process halo inference: every host verified BOTH of its
    # addressable output shards against the unsharded reference — including
    # the voxels computed from the other process's boundary planes.
    for pid in (0, 1):
        assert results[pid]["halo_shards"] == 2, results[pid]
        assert results[pid]["halo_max_diff"] < 1e-4, results[pid]

    # shard_by_host streaming -> DP: hosts pulled DIFFERENT local data ...
    assert results[0]["stream_x_sum"] != results[1]["stream_x_sum"]
    assert results[0]["stream_y_sum"] != results[1]["stream_y_sum"]
    # ... yet computed the SAME global loss (all-reduce over real rows) ...
    np.testing.assert_allclose(results[0]["stream_loss"],
                               results[1]["stream_loss"],
                               rtol=1e-5, atol=1e-6)
    # ... which equals the single-device step on the harness-reconstructed
    # global batch (per-host corner streams + direct volume reads + the
    # pipeline's scale transform).
    vdata = np.random.default_rng(17).integers(
        0, 256, size=(128, 128, 128), dtype=np.uint8)

    def host_elements(pid, n=8):
        seed = 42 * 1_000_003 + pid
        cs = corner_stream(((0, 0, 0), (54, 54, 54)), 74, seed)
        out = []
        for (cx, cy, cz), _ in zip(cs, range(n)):
            cube = vdata[cx:cx + 74, cy:cy + 74, cz:cz + 74]
            out.append(cube.astype(np.float32) / 127.5 - 1.0)
        return out

    els = {pid: host_elements(pid) for pid in (0, 1)}
    gx_s = np.stack(els[0][0:4] + els[1][0:4])[:, 37][..., None]
    gy_s = np.stack(els[0][4:8] + els[1][4:8])[:, 37][..., None]
    s2, l2 = step(state, jnp.asarray(gx_s), jnp.asarray(gy_s),
                  jax.random.PRNGKey(2))
    np.testing.assert_allclose(results[0]["stream_loss"], np.asarray(l2),
                               rtol=5e-4, atol=1e-5)
