"""Multi-host setup: jax distributed runtime + per-host data conventions.

The reference has no distributed runtime at all (SURVEY.md §2.3); on TPU
pods the recipe is:

1. every host calls :func:`initialize` (jax.distributed over DCN),
2. build one global Mesh over ``jax.devices()`` (all hosts' chips),
3. each host feeds its local batch shard via
   ``parallel.dp.host_local_batch`` (sources use ``shard_by_host=True`` for
   disjoint reproducible ROI streams),
4. the same jitted step runs SPMD everywhere — gradient all-reduce rides ICI
   within a slice and DCN across slices, orchestrated by XLA.

Checkpointing: orbax handles multi-host saves natively (every host writes
its shard; with fully-replicated state only process 0 writes).
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the jax distributed runtime (no-op if single-process).

    On TPU pods (GKE/queued resources) all arguments are auto-detected from
    the environment; pass them explicitly for manual clusters.
    """
    import jax
    plat = str(jax.config.jax_platforms or "")
    if (num_processes is not None and num_processes > 1
            and (plat == "" or plat.startswith("cpu"))):
        # Multi-process CPU (tests / local validation) needs a cross-process
        # collectives backend; gloo ships in jaxlib.  Also applied when
        # jax_platforms is unset (CPU-only machines default to cpu without
        # ever setting the config): it only configures the auxiliary CPU
        # backend, so it is harmless on TPU pods, whose ICI/DCN collectives
        # are native.
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if num_processes in (None, 1) and coordinator_address is None:
        from jax._src import distributed as _dist
        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized
        try:
            jax.distributed.initialize()
        except Exception as e:
            # Auto-detect found no cluster config — the normal single-
            # process path.  But if the environment SAYS this is a
            # multi-host job, silently degrading would be catastrophic:
            # every host would see process_index()==0, host_sharded_seed
            # would hand ALL hosts the same ROI stream, and N divergent
            # models would train with nothing ever failing (round-5 review
            # finding).  Refuse in that case instead of swallowing.
            import os
            import warnings
            markers = [k for k in ("COORDINATOR_ADDRESS",
                                   "JAX_COORDINATOR_ADDRESS",
                                   "MEGASCALE_COORDINATOR_ADDRESS")
                       if os.environ.get(k)]
            hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
            if len([h for h in hosts.split(",") if h]) > 1:
                markers.append("TPU_WORKER_HOSTNAMES")
            if markers:
                raise RuntimeError(
                    "jax.distributed auto-initialization failed but the "
                    f"environment carries multi-host markers {markers} — "
                    "refusing to degrade to isolated single-host training "
                    "(per-host ROI streams and gradient sync would "
                    "silently diverge)") from e
            warnings.warn(
                f"jax.distributed auto-initialization unavailable "
                f"({type(e).__name__}: {e}); continuing single-process",
                RuntimeWarning, stacklevel=2)
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def process_info():
    """(process_index, process_count, local_device_count) for logging/sharding."""
    import jax
    return jax.process_index(), jax.process_count(), jax.local_device_count()


def barrier(name: str = "tem_barrier", timeout_s: float = 600.0) -> None:
    """Cross-process barrier via the coordination service (no collectives).

    Aligns hosts WITHOUT touching the device collective stack — unlike
    ``multihost_utils.sync_global_devices`` this never compiles or runs a
    program, so it is safe (and necessary) *before* the first collective:
    the CPU gloo transport gives each clique a hard ~30 s rendezvous window
    at context init, which compile-time skew between hosts can blow.
    AOT-compile the step (``jitted.lower(...).compile()``), call
    ``barrier()``, then execute.  No-op when not running distributed.
    """
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))
