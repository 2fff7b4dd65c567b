"""Data-parallel training: the reference's MirroredStrategy TODO, done right.

Reference cgan.py:8-11 and README.md:93-94 left multi-device training
unimplemented because the tfa losses use per-replica Reduction.AUTO.  On TPU
this dissolves: the train step (train/cgan.py) is a pure function whose loss
means are over the *logical* (global) batch; jit it with batch-sharded inputs
over a Mesh and XLA inserts the gradient all-reduces (psum over ICI) itself.
Loss normalization is globally correct by construction.

Multi-host: each host feeds its local shard via
``jax.make_array_from_process_local_data``; the same jitted step runs SPMD.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CycleGANConfig
from ..train.cgan import build_models, cyclegan_losses, make_train_step
from ..train.state import CycleGANState
from .mesh import batch_sharding, replicated


def make_dp_train_step(config: CycleGANConfig, mesh: Mesh,
                       disc_prior: Optional[Callable] = None,
                       donate: bool = True):
    """Jit the train step with params replicated and batch sharded.

    Returns step(state, real_x, real_y, rng) -> (state, loss7); inputs may be
    host numpy (auto-sharded) or pre-sharded jax.Arrays.
    """
    import functools

    from ..ops import losses as L  # noqa: F401 (kept for symmetry)
    from ..shapes import generator_shapes
    from ..train.state import make_optimizer
    import jax.numpy as jnp

    gen, disc_x, disc_y = build_models(config, disc_prior)
    buffer = generator_shapes(config.dimsize).buffer
    opt = make_optimizer(config.learning_rate, config.adam_beta1)
    loss_fn = functools.partial(cyclegan_losses, gen, disc_x, disc_y,
                                buffer, config.focal_gamma)

    def step(state: CycleGANState, real_x, real_y, rng):
        rng = jax.random.fold_in(rng, state.step)
        grads, loss_vec = jax.grad(
            lambda gg, gf, dx, dy: loss_fn(gg, gf, dx, dy, real_x, real_y, rng),
            argnums=(0, 1, 2, 3), has_aux=True,
        )(state.gg, state.gf, state.dx, state.dy)

        params = (state.gg, state.gf, state.dx, state.dy)
        opts = (state.opt_gg, state.opt_gf, state.opt_dx, state.opt_dy)
        new_params, new_opts = [], []
        for p, o, g in zip(params, opts, grads):
            up, o2 = opt.update(g, o, p)
            new_params.append(jax.tree.map(lambda a, b: a + b, p, up))
            new_opts.append(o2)
        new_state = CycleGANState(
            step=state.step + 1,
            gg=new_params[0], gf=new_params[1], dx=new_params[2],
            dy=new_params[3],
            opt_gg=new_opts[0], opt_gf=new_opts[1], opt_dx=new_opts[2],
            opt_dy=new_opts[3])
        return new_state, loss_vec

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
