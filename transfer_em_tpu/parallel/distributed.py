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
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process / already initialized
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
