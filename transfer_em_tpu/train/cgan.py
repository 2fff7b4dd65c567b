"""CycleGAN orchestrator — the TPU-native EM2EM.

Reproduces reference transfer_em/cgan.py:32-293 with a TPU-first training
step:

* The reference runs 10 model forwards under one persistent GradientTape and
  then FOUR separate backward passes (cgan.py:144-228).  Here the four losses
  are combined into ONE scalar with ``stop_gradient`` routing exactly
  reproducing the reference's per-loss gradient targets, so a single
  ``jax.grad`` over (gg, gf, dx, dy) does one fused backward pass — XLA CSEs
  the shared forwards.  Per-loss gradient equivalence is proven in
  tests/test_train.py against finite differences and the 4-tape formulation.

* Data parallelism is first-class (the reference left MirroredStrategy as a
  TODO, cgan.py:8-11): the step is a pure function — jit it with a
  batch-sharded mesh (transfer_em_tpu.parallel.dp) and every loss mean
  becomes a global-batch mean, which is exactly the "loss normalization"
  change the reference README flags (README.md:93-94).

* Checkpointing via orbax (max 50, auto-restore latest) mirroring
  tf.train.CheckpointManager behavior (cgan.py:84-103).
"""

from __future__ import annotations

import functools
import os
import time
from contextlib import nullcontext
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CycleGANConfig
from ..models.discriminator import Discriminator
from ..models.generator import UNetGenerator
from ..ops import losses as L
from ..ops.convs import center_crop, zero_pad
from ..shapes import generator_shapes, is_valid_dimsize
from .state import CycleGANState, make_optimizer

LossVector = jax.Array  # (7,) [g_gen_total, f_gen_total, disc_y, disc_x,
#                              g_gen_only, f_gen_only, cycle]


def create_prior_helper(model_dir: str, last_layer: str):
    """Frozen feature extractor from a model's intermediate layer.

    The reference loads a Keras .h5, truncates at ``layers[last_layer]``, and
    marks it untrainable (cgan.py:21-29).  Accepted sources:

    * our exported generator directory (generator.msgpack + meta.json,
      infer/export.py);
    * a reference-architecture Keras asset — ``.h5`` file or SavedModel
      directory — converted via transfer_em_tpu.compat.

    Returns a callable tapping the named submodule's output with the
    prior's WEIGHTS frozen (the reference's ``trainable = False``,
    cgan.py:29) while input gradients flow — pass it as ``disc_prior``.

    Args:
      model_dir: model path as above.
      last_layer: submodule name to tap, e.g. "down1", "down2", "mid"
        (Keras layer indices don't survive conversion; use our names).
    """
    if (model_dir.endswith((".h5", ".keras"))
            or os.path.exists(os.path.join(model_dir, "saved_model.pb"))):
        from ..compat import prior_from_tf_generator
        return prior_from_tf_generator(model_dir, last_layer)

    from ..infer.export import load_generator

    gen, params, meta = load_generator(model_dir)
    return _tap_prior(gen, params, last_layer)


def _tap_prior(gen, params, last_layer: str):
    """Weight-frozen intermediate tap of a generator (shared by
    create_prior_helper and compat.prior_from_tf_generator).

    Freezing semantics match the reference's ``modelx.trainable = False``
    (cgan.py:29): the prior's WEIGHTS never update (stop_gradient on the
    params; they are also outside the train step's grad argnums), but the
    INPUT gradient flows — in the reference, the generator's adversarial
    loss through disc_y includes the path through the prior branch
    (discriminator.py:62-70), and TF's trainable=False does not sever it.
    An output stop_gradient here (shipped until round 5) silently removed
    that gradient path and made prior-guided training diverge from the
    reference's dynamics."""
    frozen = jax.tree.map(jax.lax.stop_gradient, params)

    def prior(x: jax.Array) -> jax.Array:
        _, state = gen.apply(frozen, x, capture_intermediates=True)
        inter = state["intermediates"]
        if last_layer not in inter:
            raise KeyError(
                f"layer {last_layer!r} not in {sorted(inter.keys())}")
        out = inter[last_layer]["__call__"][0]
        if isinstance(out, tuple):  # DownBlock returns (down, skip)
            out = out[0]
        return out

    # Exposed so imports can cross-check a checkpoint's own stored frozen
    # prior weights against this prior (compat._check_prior_matches).
    prior.params = frozen
    return prior


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


def build_models(config: CycleGANConfig,
                 disc_prior: Optional[Callable] = None):
    """Generator + two discriminators (disc_y optionally with a prior,
    reference cgan.py:58-62)."""
    cd = _dtype(config.compute_dtype)
    if cd == jnp.float32:
        cd = None
    fc = config.fast_conv
    gen = UNetGenerator(wf=config.wf, use_norm=config.use_norm,
                        compute_dtype=cd, fast_conv=fc,
                        dropout_impl=config.dropout_impl)
    disc_x = Discriminator(is3d=config.is3d, wf=config.wf,
                           use_norm=config.use_norm, compute_dtype=cd,
                           fast_conv=fc)
    disc_y = Discriminator(is3d=config.is3d, wf=config.wf,
                           use_norm=config.use_norm, compute_dtype=cd,
                           disc_prior=disc_prior, fast_conv=fc)
    return gen, disc_x, disc_y


def create_state(config: CycleGANConfig, rng: jax.Array,
                 disc_prior: Optional[Callable] = None) -> CycleGANState:
    """Initialize all parameters and optimizer states."""
    if config.dimsize < 74:
        raise ValueError("minimum dimension allowed is 74")  # cgan.py:52
    if not is_valid_dimsize(config.dimsize):
        raise ValueError(f"{config.dimsize} does not allow valid convolutions")
    gen, disc_x, disc_y = build_models(config, disc_prior)
    shapes = generator_shapes(config.dimsize)
    sp = (config.dimsize,) * (3 if config.is3d else 2)
    sp_out = (shapes.out,) * (3 if config.is3d else 2)
    x = jnp.zeros((1,) + sp + (1,), jnp.float32)
    y = jnp.zeros((1,) + sp_out + (1,), jnp.float32)
    opt = make_optimizer(config.learning_rate, config.adam_beta1)

    def _init(rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        gg = gen.init(k1, x)
        gf = gen.init(k2, x)
        dx = disc_x.init(k3, y)
        dy = disc_y.init(k4, y)
        return CycleGANState(
            step=jnp.zeros((), jnp.int32),
            gg=gg, gf=gf, dx=dx, dy=dy,
            opt_gg=opt.init(gg), opt_gf=opt.init(gf),
            opt_dx=opt.init(dx), opt_dy=opt.init(dy),
        )

    # One jitted program: eager flax init is hundreds of small device ops,
    # which is very slow on remotely-attached TPUs.
    return jax.jit(_init)(rng)


def cyclegan_losses(gen: UNetGenerator, disc_x: Discriminator,
                    disc_y: Discriminator, buffer: int, gamma: float,
                    gg, gf, dx, dy,
                    real_x: jax.Array, real_y: jax.Array,
                    rng: jax.Array, *,
                    batched_apps: bool = True,
                    ensemble_apps: bool = False,
                    deterministic: bool = False,
                    remat: bool = False) -> Tuple[jax.Array, LossVector]:
    """One combined scalar whose per-subtree gradients equal the reference's
    four ``tape.gradient`` calls (cgan.py:144-215).  See module docstring.

    batched_apps: stack the independent applications of each network into
    one larger-batch forward (6 generator applies -> 4, at up to 2x batch)
    — same math, fewer/larger kernels on the MXU.  False reproduces the
    reference's application-by-application structure (used by the
    gradient-equivalence test).
    ensemble_apps: additionally stack the G/F (and Dx/Dy) parameter trees —
    the two networks share one architecture — and run each round as ONE
    vmapped apply over the stacked params (4 gen + 4 disc applies -> 2 + 2;
    JAX's conv batch rule lowers this to grouped convs with 2x channels per
    call).  Same math as batched_apps; requires disc_prior-free discs
    (disc_y with a prior has a different param tree, so only the generators
    are stacked in that case).  Implies batched_apps.
    deterministic: disable dropout (testing only; training always uses
    dropout like the reference's training=True calls, cgan.py:152).
    remat: wrap each generator application in ``jax.checkpoint`` so its
    internal activations are recomputed in the backward pass instead of
    stored — cuts peak HBM roughly by the U-Net activation footprint,
    unlocking ~2x larger batches (PERF.md).  Identical math/gradients.

    Returns (combined_scalar, loss_vector_7).
    """
    sg = jax.lax.stop_gradient
    dx_f = jax.tree.map(sg, dx)  # frozen discs for adversarial gen terms
    dy_f = jax.tree.map(sg, dy)
    if not deterministic and getattr(gen, "dropout_impl", "ref") == "rbg8":
        # TPU-native dropout-mask stream: re-seed an 'rbg' key from the step
        # key so the XLA RngBitGenerator emits the uint8 mask bytes
        # (measured ~free; threefry costs +35-80% of each up-block convT —
        # bench_epilogue.py, PERF.md lever-4 closure).  fold_in/split
        # upstream of this point stay threefry; only the per-application
        # dropout keys below switch generator.
        data = (jax.random.key_data(rng)
                if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key)
                else rng)
        rng = jax.random.wrap_key_data(jnp.tile(data, 2)[:4], impl="rbg")
    ks = jax.random.split(rng, 6)
    B = real_x.shape[0]

    def g(params, x, k):
        if deterministic:
            return gen.apply(params, x)
        return gen.apply(params, x, deterministic=False, rngs={"dropout": k})

    if remat:
        g = jax.checkpoint(g)

    real_x_c = center_crop(real_x, buffer)
    real_y_c = center_crop(real_y, buffer)
    real_x_c2 = center_crop(real_x, buffer * 2)
    real_y_c2 = center_crop(real_y, buffer * 2)

    if ensemble_apps:
        # Stacked G/F: one vmapped apply per round (2 gen applies total).
        st_gen = jax.tree.map(lambda a, b: jnp.stack([a, b]), gg, gf)
        gens = jax.vmap(g)
        in1 = jnp.stack([jnp.concatenate([real_x, real_y], 0),
                         jnp.concatenate([real_y, real_x], 0)])
        out1 = gens(st_gen, in1, jnp.stack([ks[0], ks[1]]))
        fake_y, same_y = out1[0, :B], out1[0, B:]
        fake_x, same_x = out1[1, :B], out1[1, B:]
        in2 = jnp.stack([zero_pad(fake_x, buffer), zero_pad(fake_y, buffer)])
        out2 = gens(st_gen, in2, jnp.stack([ks[2], ks[3]]))
        cycled_y, cycled_x = out2[0], out2[1]
    elif batched_apps:
        # Round 1: everything derivable from the real images, one apply per
        # network at batch 2B.
        out_g1 = g(gg, jnp.concatenate([real_x, real_y], 0), ks[0])
        fake_y, same_y = out_g1[:B], out_g1[B:]
        out_f1 = g(gf, jnp.concatenate([real_y, real_x], 0), ks[1])
        fake_x, same_x = out_f1[:B], out_f1[B:]
        # Round 2: the cycles.
        cycled_y = g(gg, zero_pad(fake_x, buffer), ks[2])
        cycled_x = g(gf, zero_pad(fake_y, buffer), ks[3])
    else:
        # Reference structure: 6 separate generator applications
        # (cgan.py:152-183).
        fake_y = g(gg, real_x, ks[0])
        cycled_x = g(gf, zero_pad(fake_y, buffer), ks[1])
        fake_x = g(gf, real_y, ks[2])
        cycled_y = g(gg, zero_pad(fake_x, buffer), ks[3])
        same_x = g(gf, real_x, ks[4])
        same_y = g(gg, real_y, ks[5])

    cycled_x_c = center_crop(cycled_x, buffer)
    cycled_y_c = center_crop(cycled_y, buffer)

    # Fakes enter each disc twice semantically: once for the generators'
    # adversarial losses (grad -> generator, disc frozen), once for the
    # discriminator losses (grad -> disc, fake detached).  Forward values
    # are identical; XLA CSEs the duplicate computation.
    # Dx/Dy stack only when their param trees match exactly (a disc_prior
    # widens disc_y's post-concat convs: same structure, different shapes).
    same_tree = ensemble_apps and (
        jax.tree.structure(dx) == jax.tree.structure(dy)
        and all(a.shape == b.shape for a, b in
                zip(jax.tree.leaves(dx), jax.tree.leaves(dy))))
    if same_tree:
        # Stacked Dx/Dy (identical trees when disc_prior is None).
        st_disc = jax.tree.map(lambda a, b: jnp.stack([a, b]), dx, dy)
        st_disc_f = jax.tree.map(sg, st_disc)
        discs = jax.vmap(disc_x.apply)
        din = jnp.stack([jnp.concatenate([real_x_c, sg(fake_x)], 0),
                         jnp.concatenate([real_y_c, sg(fake_y)], 0)])
        dout = discs(st_disc, din)
        disc_real_x, disc_fake_x_d = dout[0, :B], dout[0, B:]
        disc_real_y, disc_fake_y_d = dout[1, :B], dout[1, B:]
        gout = discs(st_disc_f, jnp.stack([fake_x, fake_y]))
        disc_fake_x_gen, disc_fake_y_gen = gout[0], gout[1]
    else:
        if batched_apps or ensemble_apps:
            out_dx = disc_x.apply(dx, jnp.concatenate([real_x_c, sg(fake_x)], 0))
            disc_real_x, disc_fake_x_d = out_dx[:B], out_dx[B:]
            out_dy = disc_y.apply(dy, jnp.concatenate([real_y_c, sg(fake_y)], 0))
            disc_real_y, disc_fake_y_d = out_dy[:B], out_dy[B:]
        else:
            disc_real_x = disc_x.apply(dx, real_x_c)
            disc_real_y = disc_y.apply(dy, real_y_c)
            disc_fake_x_d = disc_x.apply(dx, sg(fake_x))
            disc_fake_y_d = disc_y.apply(dy, sg(fake_y))
        disc_fake_x_gen = disc_x.apply(dx_f, fake_x)
        disc_fake_y_gen = disc_y.apply(dy_f, fake_y)

    # --- losses (reference cgan.py:192-203) ---
    gen_g_loss = L.generator_adv_loss(disc_fake_y_gen, gamma=gamma)
    gen_f_loss = L.generator_adv_loss(disc_fake_x_gen, gamma=gamma)
    total_cycle = (L.cycle_loss(real_x_c2, cycled_x_c, gamma=gamma)
                   + L.cycle_loss(real_y_c2, cycled_y_c, gamma=gamma))
    id_y = L.identity_loss(real_y_c, same_y, gamma=gamma)
    id_x = L.identity_loss(real_x_c, same_x, gamma=gamma)
    total_gen_g = gen_g_loss + total_cycle + id_y
    total_gen_f = gen_f_loss + total_cycle + id_x
    disc_x_loss = L.discriminator_loss(disc_real_x, disc_fake_x_d, gamma=gamma)
    disc_y_loss = L.discriminator_loss(disc_real_y, disc_fake_y_d, gamma=gamma)

    # Combined scalar: cycle appears ONCE (its gradient flows into both
    # generators, exactly as it appears in both total_gen losses upstream).
    combined = (gen_g_loss + gen_f_loss + total_cycle + id_y + id_x
                + disc_x_loss + disc_y_loss)
    loss_vec = jnp.stack([total_gen_g, total_gen_f, disc_y_loss, disc_x_loss,
                          gen_g_loss, gen_f_loss, total_cycle])
    return combined, loss_vec


def build_step_fn(config: CycleGANConfig,
                  disc_prior: Optional[Callable] = None,
                  batched_apps: bool = True,
                  deterministic: bool = False) -> Callable:
    """The pure (un-jitted) train step: (state, real_x, real_y, rng) ->
    (state, loss7).  make_train_step jits it plain; parallel.dp jits it with
    mesh shardings.  ``deterministic`` disables dropout (testing only, e.g.
    the TF train-step golden where the reference's dropout is patched out).

    ``config.accum_steps > 1`` enables gradient accumulation: the batch is
    split into that many microbatches, the backward pass is scanned over
    them, and one optimizer update applies the averaged gradients — exact
    full-batch math (per-sample-mean losses) at microbatch-sized peak
    activation memory."""
    gen, disc_x, disc_y = build_models(config, disc_prior)
    buffer = generator_shapes(config.dimsize).buffer
    gamma = config.focal_gamma
    opt = make_optimizer(config.learning_rate, config.adam_beta1)

    loss_fn = functools.partial(cyclegan_losses, gen, disc_x, disc_y,
                                buffer, gamma, batched_apps=batched_apps,
                                ensemble_apps=config.ensemble_apps,
                                deterministic=deterministic,
                                remat=config.remat)

    accum = int(config.accum_steps)
    if accum < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum}")

    def step(state: CycleGANState, real_x, real_y, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3), has_aux=True)
        if accum == 1:
            grads, loss_vec = grad_fn(state.gg, state.gf, state.dx, state.dy,
                                      real_x, real_y, rng)
        else:
            # Gradient accumulation: scan the backward over `accum`
            # microbatches, average gradients, apply ONE update.  All losses
            # are per-sample means (ops/losses.py SUM_OVER_BATCH_SIZE), so
            # the averaged gradient equals the full-batch gradient exactly;
            # only peak activation memory shrinks (microbatch-sized).
            B = real_x.shape[0]
            if B % accum:
                raise ValueError(
                    f"batch {B} not divisible by accum_steps {accum}")
            micro = B // accum
            xm = real_x.reshape((accum, micro) + real_x.shape[1:])
            ym = real_y.reshape((accum, micro) + real_y.shape[1:])

            def body(acc, inp):
                x, y, i = inp
                g, lv = grad_fn(state.gg, state.gf, state.dx, state.dy,
                                x, y, jax.random.fold_in(rng, i))
                acc_g, acc_l = acc
                return (jax.tree.map(jnp.add, acc_g, g),
                        acc_l + lv.astype(jnp.float32)), None

            zero_g = jax.tree.map(
                jnp.zeros_like,
                (state.gg, state.gf, state.dx, state.dy))
            (gsum, lsum), _ = jax.lax.scan(
                body, (zero_g, jnp.zeros((7,), jnp.float32)),
                (xm, ym, jnp.arange(accum)))
            grads = jax.tree.map(lambda a: a / accum, gsum)
            loss_vec = lsum / accum

        params = (state.gg, state.gf, state.dx, state.dy)
        opts = (state.opt_gg, state.opt_gf, state.opt_dx, state.opt_dy)
        new_params, new_opts = [], []
        for p, o, g in zip(params, opts, grads):
            up, o2 = opt.update(g, o, p)
            new_params.append(jax.tree.map(lambda a, b: a + b, p, up))
            new_opts.append(o2)
        return CycleGANState(
            step=state.step + 1,
            gg=new_params[0], gf=new_params[1], dx=new_params[2],
            dy=new_params[3],
            opt_gg=new_opts[0], opt_gf=new_opts[1], opt_dx=new_opts[2],
            opt_dy=new_opts[3]), loss_vec

    return step


def make_train_step(config: CycleGANConfig,
                    disc_prior: Optional[Callable] = None,
                    donate: bool = True):
    """Build the jitted train step: (state, real_x, real_y, rng) -> (state, loss7).

    real_x / real_y: scaled+standardized float batches, shape
    (B, *spatial(dimsize), 1), like reference train_step (cgan.py:144).
    """
    step = build_step_fn(config, disc_prior)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_scan_train_step(config: CycleGANConfig, window: int,
                         disc_prior: Optional[Callable] = None,
                         donate: bool = True, mesh=None):
    """One device dispatch per ``window`` consecutive optimization steps.

    Scans the train step over a stacked batch window entirely on device:
    ``(state, xs, ys, rng) -> (state, losses)`` with ``xs``/``ys`` of shape
    ``(window, B, *spatial, 1)`` and ``losses`` of shape ``(window, 7)``.
    Numerically identical to ``window`` sequential ``make_train_step`` calls:
    each step's PRNG key is ``fold_in(rng, state.step)`` and the scan
    advances ``state.step`` exactly as the sequential path does.

    Why: one dispatch per ``window`` steps removes per-dispatch host
    latency where async dispatch cannot hide it (e.g. contended
    multi-process hosts).  Measured on THIS rig it is a ~9 ms/step LOSS —
    JAX's async queue already overlaps adjacent dispatches, and the
    loop-carried training state defeats the standalone step's buffer
    donation (PERF.md "Scan-window training") — so no production path
    defaults to it.  Composes with ``config.accum_steps`` (which scans
    microbatches *inside* each optimization step) — window scans *across*
    updates, accumulation scans *within* one.

    With ``mesh``, params stay replicated and the stacked batches are
    sharded over their per-step batch axis (axis 1) — the DP execution of
    parallel/dp.py, one dispatch per window.  The reference has no analogue
    (its loop is one ``tf.function`` call per step, cgan.py:260-266).
    """
    window = int(window)
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    step = build_step_fn(config, disc_prior)

    def scan_fn(state: CycleGANState, xs, ys, rng):
        if xs.shape[0] != window or ys.shape[0] != window:
            raise ValueError(
                f"stacked batches have leading dim {xs.shape[0]}/"
                f"{ys.shape[0]}, expected window={window}")

        def body(st, xy):
            st2, lv = step(st, xy[0], xy[1], rng)
            return st2, lv
        return jax.lax.scan(body, state, (xs, ys))

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=donate_argnums)
    from ..parallel.mesh import batch_sharding, replicated
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = replicated(mesh)
    # (window, B, ...): per-step batch axis 1 sharded like dp.batch_sharding.
    stacked = NamedSharding(mesh, P(None, *batch_sharding(mesh).spec))
    return jax.jit(scan_fn,
                   in_shardings=(repl, stacked, stacked, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=donate_argnums)


class EM2EM:
    """CycleGAN model for 1-channel 2D/3D data: train and predict.

    API parity with reference EM2EM (cgan.py:32-293); constructor args keep
    the reference names.
    """

    def __init__(self, dimsize: int, exp_name: str, is3d: bool = True,
                 norm_type: str = "instancenorm", ckpt_restore: Optional[str] = None,
                 wf: int = 8, focal_gamma: float = 2.0,
                 disc_prior: Optional[Callable] = None,
                 compute_dtype: str = "float32",
                 checkpoint_root: str = "./checkpoints",
                 seed: int = 0, remat: bool = False,
                 ensemble_apps: bool = False, accum_steps: int = 1,
                 dropout_impl: str = "rbg8"):
        del norm_type  # DEPRECATED upstream (cgan.py:47); norms stay disabled
        self.config = CycleGANConfig(
            dimsize=dimsize, is3d=is3d, wf=wf, focal_gamma=focal_gamma,
            compute_dtype=compute_dtype, remat=remat,
            ensemble_apps=ensemble_apps, accum_steps=accum_steps,
            dropout_impl=dropout_impl)
        self.exp_name = exp_name
        shapes = generator_shapes(dimsize)
        assert shapes.out % 2 == 0  # cgan.py:64
        self.buffer = shapes.buffer
        self.outdimsize = shapes.out
        self.is3d = is3d
        self.disc_prior = disc_prior
        self.mesh = None  # set by to_mesh()

        self.gen, self.disc_x_model, self.disc_y_model = build_models(
            self.config, disc_prior)
        self._rng = jax.random.PRNGKey(seed)
        self.state = create_state(self.config, self._rng, disc_prior)
        self._train_step = make_train_step(self.config, disc_prior)
        self._predict = jax.jit(lambda params, x: self.gen.apply(params, x))
        # Jitted shared discriminator applies so repeated discriminator_x/y
        # calls don't pay eager per-op dispatch (remote-compile rig makes
        # unjitted apply disproportionately slow).
        self._disc_x_apply = jax.jit(
            lambda params, x: self.disc_x_model.apply(params, x))
        self._disc_y_apply = jax.jit(
            lambda params, x: self.disc_y_model.apply(params, x))

        # ---- checkpoints (reference cgan.py:84-103) ----
        self.checkpoint_path = os.path.abspath(
            os.path.join(checkpoint_root, f"train_{exp_name}"))
        self._ckpt_mgr = None
        self._init_checkpoints(ckpt_restore)

    # ------------------------------------------------------------------ ckpt
    def _init_checkpoints(self, ckpt_restore: Optional[str]):
        import orbax.checkpoint as ocp
        os.makedirs(self.checkpoint_path, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=50)
        self._ckpt_mgr = ocp.CheckpointManager(self.checkpoint_path,
                                               options=options)
        if ckpt_restore is not None:
            self.restore(ckpt_restore)
        elif self._ckpt_mgr.latest_step() is not None:
            self._restore_step(self._ckpt_mgr.latest_step())
            print("Latest checkpoint restored!!")

    def make_checkpoint(self, epoch_num: int):
        """Save a checkpoint (reference cgan.py:105-108).

        Orbax saves ASYNCHRONOUSLY — the serialize/write happens on a
        background thread while training continues (the old explicit
        wait_until_finished here serialized every save into the step loop).
        ``wait_until_finished`` is called before restores and at the end of
        ``train``; call it yourself before reading checkpoint files directly.
        """
        self._ckpt_mgr.save(epoch_num, args=self._save_args())
        print(f"Saving checkpoint for epoch {epoch_num} at "
              f"{self.checkpoint_path}/{epoch_num}")

    def wait_until_finished(self):
        """Block until any in-flight async checkpoint save completes."""
        self._ckpt_mgr.wait_until_finished()

    def _save_args(self):
        import orbax.checkpoint as ocp
        return ocp.args.StandardSave(jax.tree.map(np.asarray, self.state))

    def _restore_step(self, step: int, mgr=None):
        import orbax.checkpoint as ocp
        self._ckpt_mgr.wait_until_finished()  # drain any in-flight save
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, self.state)
        self.state = (mgr or self._ckpt_mgr).restore(
            step, args=ocp.args.StandardRestore(abstract))

    def restore(self, ckpt_restore: str | int):
        """Restore from an explicit checkpoint: a step number (this
        experiment's manager) or a path ``.../train_<exp>/<step>`` — possibly
        from a DIFFERENT experiment, like the reference's
        ``ckpt.restore(ckpt_restore)`` with an explicit prefix
        (cgan.py:98-100; save_model reconstructs from any checkpoint path,
        utils.py:140-149)."""
        s = str(ckpt_restore).rstrip(os.sep)
        if isinstance(ckpt_restore, int) or os.sep not in s:
            self._restore_step(int(s))
        else:
            import orbax.checkpoint as ocp
            root = os.path.abspath(os.path.dirname(s))
            mgr = ocp.CheckpointManager(root)
            try:
                self._restore_step(int(os.path.basename(s)), mgr=mgr)
            finally:
                mgr.close()
        print(f"checkpoint {ckpt_restore} restored")

    @classmethod
    def from_reference_checkpoint(cls, ckpt_path: str, exp_name: str,
                                  dimsize: int = 74,
                                  disc_prior: Optional[Callable] = None,
                                  **kwargs) -> "EM2EM":
        """Continue a REFERENCE training run here: build an EM2EM whose
        parameters AND Adam optimizer slots/step come from a reference
        ``tf.train.Checkpoint`` (reference cgan.py:86-103; conversion in
        compat.load_reference_checkpoint — both TF checkpoint layouts).
        ``wf``/2D-3D are inferred from the weights; remaining kwargs pass
        through to ``__init__`` (checkpoint_root, compute_dtype, ...).

        ``disc_prior``: if the run was trained with one (reference
        cgan.py:59), pass the same frozen feature extractor — e.g.
        ``create_prior_helper(prior.h5, "down1")`` on the original prior
        model; it reconstructs discriminator_y's post-concat shapes and
        rides along into the new model."""
        from ..compat import load_reference_checkpoint
        state, wf, is3d = load_reference_checkpoint(ckpt_path, disc_prior)
        model = cls(dimsize, exp_name, is3d=is3d, wf=wf,
                    disc_prior=disc_prior, **kwargs)
        if model._ckpt_mgr.latest_step() is not None:
            raise ValueError(
                f"experiment {exp_name!r} already has checkpoints at "
                f"{model.checkpoint_path} (they would collide with the "
                "imported run's step numbering) — pass a fresh exp_name, "
                "or restore the existing run with EM2EM(...) directly")
        want = jax.tree.structure(model.state)
        got = jax.tree.structure(state)
        if want != got:
            raise ValueError(
                f"imported checkpoint structure {got} does not match the "
                f"built model {want}")
        for a, b in zip(jax.tree.leaves(model.state),
                        jax.tree.leaves(state)):
            if tuple(a.shape) != tuple(b.shape):
                raise ValueError(
                    f"imported leaf shape {b.shape} != model {a.shape}")
        model.state = state
        return model

    # ------------------------------------------------------------ multi-chip
    def to_mesh(self, mesh=None) -> "EM2EM":
        """Switch training to data-parallel execution over a device Mesh.

        Replicates the state, swaps in the batch-sharded jitted step
        (parallel.dp), and shards incoming batches over the mesh.  The
        reference left this as its MirroredStrategy TODO (cgan.py:8-11).
        Returns self for chaining:  EM2EM(...).to_mesh().
        """
        from ..parallel import make_dp_train_step, make_mesh, shard_state
        self.mesh = mesh if mesh is not None else make_mesh()
        self.state = shard_state(self.state, self.mesh)
        self._train_step = make_dp_train_step(self.config, self.mesh,
                                              self.disc_prior)
        return self

    # ----------------------------------------------------------------- train
    def train_step(self, real_x, real_y) -> np.ndarray:
        """One optimization step; returns the 7-loss vector (cgan.py:144)."""
        mesh = self.mesh
        if mesh is not None:
            from ..parallel import shard_batch
            real_x = shard_batch(jnp.asarray(real_x), mesh)
            real_y = shard_batch(jnp.asarray(real_y), mesh)
        else:
            real_x = jnp.asarray(real_x)
            real_y = jnp.asarray(real_y)
        self.state, loss = self._train_step(self.state, real_x, real_y,
                                            self._rng)
        return loss

    def _scan_window(self, scan_step, window) -> jax.Array:
        """Stack a window of (x, y) batch pairs and run them in ONE scanned
        dispatch; returns the summed 7-loss vector (on device)."""
        xs = jnp.stack([jnp.asarray(x) for x, _ in window])
        ys = jnp.stack([jnp.asarray(y) for _, y in window])
        self.state, losses = scan_step(self.state, xs, ys, self._rng)
        return losses.sum(axis=0)

    def train(self, train_input: Iterable, train_target: Iterable,
              epochs: int = 3000, start: int = 0, debug: bool = False,
              sample=None, sample_gt=None, enable_eager: bool = False,
              num_samples: int = 4096, check_freq: int = 1,
              metrics_log: Optional[str] = None,
              profile_dir: Optional[str] = None,
              scan_window: int = 1):
        """Main training loop (reference cgan.py:242-287).

        train_input / train_target: iterables of batches re-iterable per epoch
        (our data pipelines, or any pair of iterables of float batches).
        ``enable_eager`` maps to jax.disable_jit for debugging.
        ``metrics_log``: JSONL path for per-epoch losses/timing.
        ``profile_dir``: capture a jax.profiler trace of the run.
        ``scan_window``: dispatch this many optimization steps per device
        call (make_scan_train_step) — same math, less per-step host latency;
        epoch tails shorter than the window run through the per-step path.
        """
        from .metrics import MetricsLogger, profile_trace

        scan_window = int(scan_window)
        scan_step = None
        if scan_window > 1 and not enable_eager:
            scan_step = make_scan_train_step(self.config, scan_window,
                                             self.disc_prior, mesh=self.mesh)
        logger = MetricsLogger(metrics_log)
        maybe_eager = jax.disable_jit if enable_eager else nullcontext
        pbar = None
        # The cleanup below runs in ``finally``: a mid-epoch exception (OOM,
        # a failed streaming fetch, Ctrl-C) must still drain the async orbax
        # writer — the checkpoint from the last check_freq epoch is exactly
        # what a crashed run resumes from — and close the metrics file and
        # progress bar (a leaked tqdm bar corrupts subsequent terminal output).
        try:
          with maybe_eager(), profile_trace(profile_dir):
            for epoch in range(start, start + epochs):
                t0 = time.time()
                loss = np.zeros((7,), np.float32)
                count = 0
                pbar = None
                if debug:
                    try:  # progress bar (reference cgan.py:256-262)
                        import tqdm
                        pbar = tqdm.tqdm(total=num_samples)
                    except ImportError:
                        pass
                # Accumulate the loss ON DEVICE and fetch once per epoch:
                # fetching per step would synchronize the dispatch pipeline
                # (~28 ms/step on remotely-attached TPUs, CLAUDE.md).
                loss_acc = None
                window = []
                for data_f, data_g in zip(train_input, train_target):
                    if scan_step is None:
                        l = self.train_step(data_f, data_g)
                        loss_acc = l if loss_acc is None else loss_acc + l
                        count += 1
                    else:
                        if window and (
                                jnp.shape(data_f) != jnp.shape(window[0][0])
                                or jnp.shape(data_g)
                                != jnp.shape(window[0][1])):
                            # Ragged batch (e.g. a user iterable without
                            # drop_remainder): flush the partial window
                            # through the per-step path and start fresh.
                            for wf_, wg_ in window:
                                l = self.train_step(wf_, wg_)
                                loss_acc = (l if loss_acc is None
                                            else loss_acc + l)
                                count += 1
                            window = []
                        window.append((data_f, data_g))
                        if len(window) == scan_window:
                            l = self._scan_window(scan_step, window)
                            loss_acc = (l if loss_acc is None
                                        else loss_acc + l)
                            count += scan_window
                            window = []
                    if pbar is not None:
                        pbar.update(1)
                for data_f, data_g in window:  # tail shorter than the window
                    l = self.train_step(data_f, data_g)
                    loss_acc = l if loss_acc is None else loss_acc + l
                    count += 1
                if pbar is not None:
                    pbar.close()
                    pbar = None
                if count:
                    loss = np.asarray(loss_acc) / count
                print(f"Epoch {epoch+1} loss [g_gen_total, f_gen_total, "
                      f"disc_y, disc_x, g_gen_only, f_gen_only, cycle]: {loss}")
                logger.log_epoch(epoch + 1, loss, time.time() - t0, count)

                if (epoch + 1) % check_freq == 0:
                    self.make_checkpoint(epoch + 1)
                    # Gated on debug AND sample, like the reference
                    # (cgan.py:275 "if debug and sample is not None") — the
                    # sample predict is a fresh XLA compile at the sample's
                    # shape plus a blocking fetch; it must not fire on a
                    # non-debug run just because a sample was passed.
                    if debug and sample is not None:
                        sample_pred = self.predict(sample)
                        if sample_gt is not None:
                            gt_c = center_crop(jnp.asarray(sample_gt), self.buffer)
                            acc = float(L.rmse(gt_c[0], sample_pred[0]))
                            print(f"Accuracy on sample: {acc}")
                        # reference cgan.py:285 shows the pair in-loop;
                        # headless here: write a side-by-side PNG
                        from ..debug import generate_images
                        generate_images(
                            sample, sample_pred, show=False,
                            save_path=f"{self.exp_name}_sample.png")
                print(f"Time taken for epoch {epoch+1} is {time.time()-t0}")
        finally:
            if pbar is not None:  # left open by a mid-epoch exception
                pbar.close()
            try:
                self.wait_until_finished()  # drain the async checkpoint writer
            finally:
                logger.close()  # flush metrics even if the ckpt drain raised

    # ------------------------------------------------------------ inspection
    def plot_generator(self, location: str):
        """Write a generator architecture summary (reference cgan.py:237-240
        used keras plot_model; here: flax tabulate to text, or a rendered
        image when ``location`` ends with .png)."""
        self._plot_model(self.gen, True, location)

    def plot_discriminator(self, location: str):
        """Discriminator summary (reference cgan.py:232-235)."""
        self._plot_model(self.disc_x_model, False, location)

    def _plot_model(self, module, is_gen: bool, location: str):
        sp = (self.config.dimsize if is_gen else self.outdimsize,)
        sp = sp * (3 if self.is3d else 2)
        x = jnp.zeros((1,) + sp + (1,), jnp.float32)
        import flax.linen as nn
        table = nn.tabulate(module, jax.random.PRNGKey(0),
                            console_kwargs={"width": 120})(x)
        if location.endswith(".png"):
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig = plt.figure(figsize=(14, max(4, table.count("\n") * 0.22)))
            fig.text(0.01, 0.99, table, family="monospace", fontsize=6,
                     va="top")
            plt.axis("off")
            plt.savefig(location, dpi=150, bbox_inches="tight")
            plt.close(fig)
        else:
            with open(location, "w") as f:
                f.write(table)

    # --------------------------------------------------------------- predict
    def predict(self, data) -> jax.Array:
        """Generator G forward (reference cgan.py:289-293)."""
        return self._predict(self.state.gg, jnp.asarray(data))

    def predict_f(self, data) -> jax.Array:
        """Generator F forward (Y -> X)."""
        return self._predict(self.state.gf, jnp.asarray(data))

    # ---- reference-named network attributes (cgan.py:58-62) ----
    # The reference exposes the four Keras models directly; here each is a
    # callable view binding the Flax module to the LIVE training params
    # (tracks training — taken fresh from self.state on every access).
    @property
    def generator_g(self) -> "BoundModel":
        return BoundModel(self.gen, lambda: self.state.gg, self._predict)

    @property
    def generator_f(self) -> "BoundModel":
        return BoundModel(self.gen, lambda: self.state.gf, self._predict)

    @property
    def discriminator_x(self) -> "BoundModel":
        return BoundModel(self.disc_x_model, lambda: self.state.dx,
                          self._disc_x_apply)

    @property
    def discriminator_y(self) -> "BoundModel":
        return BoundModel(self.disc_y_model, lambda: self.state.dy,
                          self._disc_y_apply)


class BoundModel:
    """A Flax module bound to live params — the TPU-native stand-in for the
    reference's direct Keras-model attributes (cgan.py:58-62).  Calling it
    runs a forward pass with the CURRENT training params; `.module` /
    `.params` expose the pieces for functional use (e.g. `infer.predict_volume
    (..., gen_apply=bm.module.apply, params=bm.params)`)."""

    def __init__(self, module, params_fn, apply_fn=None):
        self.module = module
        self._params_fn = params_fn
        self._apply = apply_fn  # jitted shared fn for generators, else apply

    @property
    def params(self):
        return self._params_fn()

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x)
        if self._apply is not None:
            return self._apply(self.params, x)
        return self.module.apply(self.params, x)
