"""Data-parallel training: the reference's MirroredStrategy TODO, done right.

Reference cgan.py:8-11 and README.md:93-94 left multi-device training
unimplemented because the tfa losses use per-replica Reduction.AUTO.  On TPU
this dissolves: the train step (train/cgan.py) is a pure function whose loss
means are over the *logical* (global) batch; jit it with batch-sharded inputs
over a Mesh and XLA inserts the gradient all-reduces (psum over ICI) itself.
Loss normalization is globally correct by construction — verified equal to
the single-device step in tests/test_parallel.py.

Multi-host: each host feeds its local shard via
``jax.make_array_from_process_local_data``; the same jitted step runs SPMD.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh

from ..config import CycleGANConfig
from ..train.cgan import build_step_fn
from ..train.state import CycleGANState
from .mesh import batch_sharding, replicated


def make_dp_train_step(config: CycleGANConfig, mesh: Mesh,
                       disc_prior: Optional[Callable] = None,
                       donate: bool = True):
    """Jit the train step with params replicated and batch sharded.

    Returns step(state, real_x, real_y, rng) -> (state, loss7); inputs may be
    host numpy (auto-sharded) or pre-sharded jax.Arrays.
    """
    step = build_step_fn(config, disc_prior)
    repl = replicated(mesh)        # params/opt state: fully replicated
    batched = batch_sharding(mesh)  # batches: sharded over the mesh
    return jax.jit(
        step,
        in_shardings=(repl, batched, batched, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def shard_state(state: CycleGANState, mesh: Mesh) -> CycleGANState:
    """Replicate the training state across the mesh."""
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with batch-axis sharding."""
    return jax.device_put(batch, batch_sharding(mesh))


def host_local_batch(batch, mesh: Mesh):
    """Assemble a global batch-sharded array from per-host local data
    (multi-host training; each host passes only its shard)."""
    return jax.make_array_from_process_local_data(batch_sharding(mesh), batch)