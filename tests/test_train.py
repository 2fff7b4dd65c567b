"""Training-step tests: gradient-routing equivalence, step mechanics, EM2EM.

The central claim (train/cgan.py): one combined scalar with stop_gradient
routing has per-subtree gradients identical to the reference's four separate
``tape.gradient`` calls (cgan.py:207-215).  ``test_gradients_match_four_tape``
verifies this by computing each of the four losses standalone and
differentiating it only w.r.t. its own parameters.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.config import CycleGANConfig
from transfer_em_tpu.ops import losses as L
from transfer_em_tpu.ops.convs import center_crop, zero_pad
from transfer_em_tpu.shapes import generator_shapes
from transfer_em_tpu.train import (create_state, cyclegan_losses,
                                   make_train_step)
from transfer_em_tpu.train.cgan import build_models


def tiny_config():
    # 2D, narrowest widths -> fast on CPU. 74 is the minimum valid dimsize.
    return CycleGANConfig(dimsize=74, is3d=False, wf=32)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    gen, disc_x, disc_y = build_models(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.normal(size=(2, 74, 74, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 74, 74, 1)).astype(np.float32))
    return cfg, gen, disc_x, disc_y, state, x, y


def _four_tape_grads(gen, disc_x, disc_y, buffer, gamma, state, real_x, real_y,
                     rng):
    """Reference semantics: each loss differentiated w.r.t. its own params
    only (cgan.py:207-215), with all forwards recomputed per loss."""
    ks = jax.random.split(rng, 6)

    def g(params, x, k):
        return gen.apply(params, x, deterministic=False, rngs={"dropout": k})

    def forwards(gg, gf, dx, dy):
        fake_y = g(gg, real_x, ks[0])
        cycled_x = g(gf, zero_pad(fake_y, buffer), ks[1])
        fake_x = g(gf, real_y, ks[2])
        cycled_y = g(gg, zero_pad(fake_x, buffer), ks[3])
        same_x = g(gf, real_x, ks[4])
        same_y = g(gg, real_y, ks[5])
        return fake_y, cycled_x, fake_x, cycled_y, same_x, same_y

    real_x_c = center_crop(real_x, buffer)
    real_y_c = center_crop(real_y, buffer)
    real_x_c2 = center_crop(real_x, buffer * 2)
    real_y_c2 = center_crop(real_y, buffer * 2)

    def total_gen_g(gg):
        fake_y, cycled_x, fake_x, cycled_y, _, same_y = forwards(
            gg, state.gf, state.dx, state.dy)
        adv = L.generator_adv_loss(disc_y.apply(state.dy, fake_y), gamma=gamma)
        cyc = (L.cycle_loss(real_x_c2, center_crop(cycled_x, buffer), gamma=gamma)
               + L.cycle_loss(real_y_c2, center_crop(cycled_y, buffer), gamma=gamma))
        ident = L.identity_loss(real_y_c, same_y, gamma=gamma)
        return adv + cyc + ident

    def total_gen_f(gf):
        fake_y, cycled_x, fake_x, cycled_y, same_x, _ = forwards(
            state.gg, gf, state.dx, state.dy)
        adv = L.generator_adv_loss(disc_x.apply(state.dx, fake_x), gamma=gamma)
        cyc = (L.cycle_loss(real_x_c2, center_crop(cycled_x, buffer), gamma=gamma)
               + L.cycle_loss(real_y_c2, center_crop(cycled_y, buffer), gamma=gamma))
        ident = L.identity_loss(real_x_c, same_x, gamma=gamma)
        return adv + cyc + ident

    def disc_x_loss(dx):
        fake_y, cycled_x, fake_x, cycled_y, _, _ = forwards(
            state.gg, state.gf, dx, state.dy)
        return L.discriminator_loss(disc_x.apply(dx, real_x_c),
                                    disc_x.apply(dx, fake_x), gamma=gamma)

    def disc_y_loss(dy):
        fake_y, *_ = forwards(state.gg, state.gf, state.dx, dy)
        return L.discriminator_loss(disc_y.apply(dy, real_y_c),
                                    disc_y.apply(dy, fake_y), gamma=gamma)

    return (jax.grad(total_gen_g)(state.gg),
            jax.grad(total_gen_f)(state.gf),
            jax.grad(disc_x_loss)(state.dx),
            jax.grad(disc_y_loss)(state.dy))


def test_gradients_match_four_tape(setup):
    cfg, gen, disc_x, disc_y, state, x, y = setup
    buffer = generator_shapes(cfg.dimsize).buffer
    rng = jax.random.PRNGKey(7)

    combined = lambda gg, gf, dx, dy: cyclegan_losses(
        gen, disc_x, disc_y, buffer, cfg.focal_gamma,
        gg, gf, dx, dy, x, y, rng, batched_apps=False)
    grads, _ = jax.grad(combined, argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, state.dy)

    want = _four_tape_grads(gen, disc_x, disc_y, buffer, cfg.focal_gamma,
                            state, x, y, rng)
    for got_tree, want_tree, name in zip(grads, want, ["gg", "gf", "dx", "dy"]):
        got_flat = jax.tree.leaves(got_tree)
        want_flat = jax.tree.leaves(want_tree)
        assert len(got_flat) == len(want_flat)
        for a, b in zip(got_flat, want_flat):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-6, err_msg=name)


def test_batched_apps_equivalent_when_deterministic(setup):
    """Batched model applications (4 big forwards) == the reference's 6
    separate applications — exactly, for values AND gradients — when dropout
    is off (with dropout on, only the mask draw differs)."""
    cfg, gen, disc_x, disc_y, state, x, y = setup
    buffer = generator_shapes(cfg.dimsize).buffer
    rng = jax.random.PRNGKey(3)

    def make(batched):
        return lambda gg, gf, dx, dy: cyclegan_losses(
            gen, disc_x, disc_y, buffer, cfg.focal_gamma,
            gg, gf, dx, dy, x, y, rng, batched_apps=batched,
            deterministic=True)

    (gb, vb) = jax.grad(make(True), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, state.dy)
    (gu, vu) = jax.grad(make(False), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, state.dy)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vu),
                               rtol=1e-5, atol=1e-7)
    for tb, tu in zip(gb, gu):
        for a, b in zip(jax.tree.leaves(tb), jax.tree.leaves(tu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-7)


def test_ensemble_apps_equivalent(setup):
    """ensemble_apps (stacked G/F and Dx/Dy param trees, one vmapped apply
    per round) == batched_apps for values and gradients.  With the same rng
    the dropout keys per application line up exactly, so this holds with
    dropout ON; tolerances cover grouped-conv lowering numerics."""
    cfg, gen, disc_x, disc_y, state, x, y = setup
    buffer = generator_shapes(cfg.dimsize).buffer
    rng = jax.random.PRNGKey(13)

    def make(ensemble):
        return lambda gg, gf, dx, dy: cyclegan_losses(
            gen, disc_x, disc_y, buffer, cfg.focal_gamma,
            gg, gf, dx, dy, x, y, rng, ensemble_apps=ensemble)

    (ge, ve) = jax.grad(make(True), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, state.dy)
    (gb, vb) = jax.grad(make(False), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, state.dy)
    np.testing.assert_allclose(np.asarray(ve), np.asarray(vb),
                               rtol=1e-5, atol=1e-6)
    for te, tb in zip(ge, gb):
        for a, b in zip(jax.tree.leaves(te), jax.tree.leaves(tb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)


def test_ensemble_apps_with_disc_prior_falls_back(setup):
    """With a disc_prior, Dx/Dy param trees differ — ensemble mode stacks
    only the generators (the same_tree=False partial-stacking branch,
    train/cgan.py).  Must equal batched_apps for the loss vector AND every
    gradient (same rng -> same dropout draws), not merely stay finite."""
    cfg, gen, disc_x, _, state, x, y = setup
    from transfer_em_tpu.train.cgan import build_models

    # Prior output must spatially match the post-down2 feature map
    # (40 -> hack 38 -> conv 36 -> stride2 17 for the 2D disc).
    prior = lambda t: jax.lax.stop_gradient(t[:, :34:2, :34:2, :])
    _, _, disc_yp = build_models(cfg, disc_prior=prior)
    dyp = disc_yp.init(jax.random.PRNGKey(9),
                       jnp.zeros((1, 40, 40, 1), jnp.float32))
    buffer = generator_shapes(cfg.dimsize).buffer
    rng = jax.random.PRNGKey(0)

    def make(ensemble):
        return lambda gg, gf, dx, dy: cyclegan_losses(
            gen, disc_x, disc_yp, buffer, cfg.focal_gamma,
            gg, gf, dx, dy, x, y, rng, ensemble_apps=ensemble)

    (ge, ve) = jax.grad(make(True), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, dyp)
    (gb, vb) = jax.grad(make(False), argnums=(0, 1, 2, 3), has_aux=True)(
        state.gg, state.gf, state.dx, dyp)
    np.testing.assert_allclose(np.asarray(ve), np.asarray(vb),
                               rtol=1e-5, atol=1e-6)
    for te, tb in zip(ge, gb):
        for a, b in zip(jax.tree.leaves(te), jax.tree.leaves(tb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)


def test_remat_identical_losses_and_grads(setup):
    """remat=True (jax.checkpoint around generator applies) must be a pure
    memory/recompute trade: same losses, same gradients, same dropout
    masks (checkpoint replays the same PRNG keys)."""
    cfg, gen, disc_x, disc_y, state, x, y = setup
    buffer = generator_shapes(cfg.dimsize).buffer
    rng = jax.random.PRNGKey(11)

    def make(remat):
        return lambda gg, gf, dx, dy: cyclegan_losses(
            gen, disc_x, disc_y, buffer, cfg.focal_gamma,
            gg, gf, dx, dy, x, y, rng, remat=remat)

    (g0, l0), (g1, l1) = [
        jax.jit(lambda gg, gf, dx, dy, f=make(r): jax.grad(
            f, argnums=(0, 1, 2, 3), has_aux=True)(gg, gf, dx, dy))(
                state.gg, state.gf, state.dx, state.dy)
        for r in (False, True)]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_loss_vector_matches_reference_structure(setup):
    cfg, gen, disc_x, disc_y, state, x, y = setup
    buffer = generator_shapes(cfg.dimsize).buffer
    _, vec = cyclegan_losses(gen, disc_x, disc_y, buffer, cfg.focal_gamma,
                             state.gg, state.gf, state.dx, state.dy, x, y,
                             jax.random.PRNGKey(0))
    vec = np.asarray(vec)
    assert vec.shape == (7,)
    assert np.all(np.isfinite(vec))
    # [g_tot, f_tot, disc_y, disc_x, g_only, f_only, cycle]
    # total = adv_only + cycle + identity  =>  total > adv_only + cycle is
    # not guaranteed (identity >= 0 is: focal CE >= 0)
    assert vec[0] >= vec[4] + vec[6] - 1e-5
    assert vec[1] >= vec[5] + vec[6] - 1e-5


def test_train_step_updates_all_params(setup):
    cfg, gen, disc_x, disc_y, state, x, y = setup
    step = make_train_step(cfg, donate=False)
    new_state, loss = step(state, x, y, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert np.all(np.isfinite(np.asarray(loss)))
    for name in ["gg", "gf", "dx", "dy"]:
        before = jax.tree.leaves(getattr(state, name))
        after = jax.tree.leaves(getattr(new_state, name))
        changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                      for a, b in zip(before, after))
        assert changed, f"{name} params did not update"


def test_train_step_deterministic(setup):
    cfg, gen, disc_x, disc_y, state, x, y = setup
    step = make_train_step(cfg, donate=False)
    s1, l1 = step(state, x, y, jax.random.PRNGKey(5))
    s2, l2 = step(state, x, y, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_accum_steps_equals_full_batch(setup):
    """Gradient accumulation (config.accum_steps) is exact full-batch math:
    with dropout off, the accumulated step's losses and updated parameters
    match the plain step to float rounding (per-sample-mean losses make the
    microbatch-averaged gradient equal the full-batch gradient)."""
    import dataclasses
    from transfer_em_tpu.train.cgan import build_step_fn
    cfg, gen, disc_x, disc_y, state, x, y = setup
    full = jax.jit(build_step_fn(cfg, deterministic=True))
    acc = jax.jit(build_step_fn(dataclasses.replace(cfg, accum_steps=2),
                                deterministic=True))
    s1, l1 = full(state, x, y, jax.random.PRNGKey(0))
    s2, l2 = acc(state, x, y, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-5, atol=2e-6)
    # atol 1e-5 vs the ~2e-4 Adam step scale: near-zero gradients pass
    # through Adam's epsilon with amplified float rounding.
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_accum_steps_with_dropout_trains(setup):
    """With dropout ON the microbatch keys differ from the full-batch keys
    (each microbatch folds its index), so exact equality is not expected —
    but the step must run, update every network, and stay finite; and the
    batch must divide accum_steps."""
    cfg, gen, disc_x, disc_y, state, x, y = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, accum_steps=2)
    step = make_train_step(cfg2, donate=False)
    new_state, loss = step(state, x, y, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(loss)))
    for name in ["gg", "gf", "dx", "dy"]:
        before = jax.tree.leaves(getattr(state, name))
        after = jax.tree.leaves(getattr(new_state, name))
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(before, after)), f"{name} did not update"
    bad = make_train_step(dataclasses.replace(cfg, accum_steps=3),
                          donate=False)
    with pytest.raises(ValueError, match="divisible"):
        bad(state, x, y, jax.random.PRNGKey(0))


def test_dropout_active_in_training(setup):
    """Generator applications in training mode use dropout (training=True in
    reference train_step, cgan.py:152).  At init the dropout-bearing up-path
    is strongly attenuated (N(0,0.02) weights), so the effect on outputs is
    tiny but must be nonzero: different rngs -> bitwise-different outputs,
    and an rng-free deterministic apply must be reproducible."""
    cfg, gen, disc_x, disc_y, state, x, y = setup
    y1 = gen.apply(state.gg, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = gen.apply(state.gg, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.array_equal(np.asarray(y1), np.asarray(y2))
    d1 = gen.apply(state.gg, x)
    d2 = gen.apply(state.gg, x)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # dropout must demand an rng when active (i.e. it is really wired in)
    with pytest.raises(Exception):
        gen.apply(state.gg, x, deterministic=False)


def test_create_state_rejects_small_dims():
    with pytest.raises(ValueError):
        create_state(CycleGANConfig(dimsize=64, is3d=False),
                     jax.random.PRNGKey(0))


def test_scan_window_equals_sequential(setup):
    """make_scan_train_step(window=K) runs K optimization steps in ONE
    dispatch and matches K sequential make_train_step calls: the scanned
    body folds the same per-step key (rng, state.step), so dropout and the
    updates line up step for step."""
    from transfer_em_tpu.train import make_scan_train_step
    cfg, gen, disc_x, disc_y, state, x, y = setup
    rng = np.random.default_rng(7)
    K = 3
    xs = jnp.asarray(rng.normal(size=(K, 2, 74, 74, 1)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(K, 2, 74, 74, 1)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    step = make_train_step(cfg, donate=False)
    st = state
    seq_losses = []
    for i in range(K):
        st, lv = step(st, xs[i], ys[i], key)
        seq_losses.append(np.asarray(lv))

    scan = make_scan_train_step(cfg, K, donate=False)
    st2, losses = scan(state, xs, ys, key)
    assert losses.shape == (K, 7)
    np.testing.assert_allclose(np.asarray(losses), np.stack(seq_losses),
                               rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_scan_window_mesh_equals_single_device(setup):
    """The meshed scan step (params replicated, per-step batch axis sharded
    over 'data') agrees with the unmeshed scan."""
    from transfer_em_tpu.parallel import make_mesh
    from transfer_em_tpu.train import make_scan_train_step
    cfg, gen, disc_x, disc_y, state, x, y = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = make_mesh()
    rng = np.random.default_rng(8)
    K = 2
    B = len(jax.devices())
    xs = jnp.asarray(rng.normal(size=(K, B, 74, 74, 1)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(K, B, 74, 74, 1)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    plain = make_scan_train_step(cfg, K, donate=False)
    meshed = make_scan_train_step(cfg, K, donate=False, mesh=mesh)
    s1, l1 = plain(state, xs, ys, key)
    s2, l2 = meshed(state, xs, ys, key)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-4, atol=1e-5)
    # atol covers Adam-step-scale noise (lr=2e-4): sharded psum reorders
    # reductions, and a rounding-scale gradient flips sign through Adam's
    # epsilon; 2 compounded steps (cf. test_parallel.py one-step bounds).
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_scan_window_rejects_bad_window(setup):
    from transfer_em_tpu.train import make_scan_train_step
    cfg = setup[0]
    with pytest.raises(ValueError, match="window"):
        make_scan_train_step(cfg, 0)
