"""End-to-end: the simple_training recipe (SURVEY.md §4 fixture #2).

Given only a target domain, manufacture a source domain with warp (blur +
holes), train the CycleGAN a little, and verify the machinery: losses move,
checkpoints save/restore exactly, prediction + RMSE evaluation work.
(The reference's de-facto test is examples/simple_training.ipynb.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.data import create_dataset_from_tensors
from transfer_em_tpu.debug import accuracy, warp
from transfer_em_tpu.ops.convs import center_crop
from transfer_em_tpu.train import EM2EM


def make_patches(rng, n=8, size=74):
    """Synthetic structured grayscale patches (the reference's shipped
    resources.tgz is absent upstream — SURVEY.md §2.2 note — so we
    synthesize blobby EM-ish texture with a numpy box smooth)."""
    xs = []
    for _ in range(n):
        v = rng.normal(size=(size + 8, size + 8)).astype(np.float32)
        c = np.cumsum(np.cumsum(v, 0), 1)
        s = (c[8:, 8:] - c[:-8, 8:] - c[8:, :-8] + c[:-8, :-8])[:size, :size]
        s = (s - s.min()) / max(float(np.ptp(s)), 1e-6)
        xs.append((s * 255).astype(np.uint8))
    return xs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    ckroot = str(tmp_path_factory.mktemp("ck"))
    rng = np.random.default_rng(0)
    patches = make_patches(rng, n=4)

    target_ds, meanstd_y = create_dataset_from_tensors(
        patches, batch_size=2, enable_augmentation=False)
    source_ds, meanstd_x = create_dataset_from_tensors(
        patches, batch_size=2, custom_map=warp, enable_augmentation=False)

    model = EM2EM(74, "e2e_test", is3d=False, wf=32,
                  checkpoint_root=ckroot, seed=0)
    model.train(source_ds, target_ds, epochs=1, check_freq=1)
    return model, ckroot, source_ds, meanstd_x, meanstd_y


def test_training_produces_checkpoint(trained):
    model, ckroot, *_ = trained
    assert model._ckpt_mgr.latest_step() == 1
    assert int(model.state.step) == 2  # 2 batches x 1 epoch


def test_predict_shapes_and_eval(trained):
    model, _, source_ds, *_ = trained
    batch = next(iter(source_ds))
    pred = model.predict(batch)
    assert pred.shape == (2, 40, 40, 1)
    gt = center_crop(batch, model.buffer)
    rmse = accuracy(gt[0], pred[0])
    assert np.isfinite(rmse)


def test_checkpoint_restore_exact(trained):
    model, ckroot, *_ = trained
    restored = EM2EM(74, "e2e_test", is3d=False, wf=32,
                     checkpoint_root=ckroot, seed=123)  # different init seed
    for a, b in zip(jax.tree.leaves(model.state.gg),
                    jax.tree.leaves(restored.state.gg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree.leaves(model.state.opt_gg),
                    jax.tree.leaves(restored.state.opt_gg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_training_continues_from_restore(trained):
    model, ckroot, source_ds, *_ = trained
    restored = EM2EM(74, "e2e_test", is3d=False, wf=32,
                     checkpoint_root=ckroot)
    step_before = int(restored.state.step)
    batch = next(iter(source_ds))
    restored.train_step(batch, batch)
    assert int(restored.state.step) == step_before + 1


def test_export_after_training(trained, tmp_path):
    from transfer_em_tpu.config import ExportMeta
    from transfer_em_tpu.infer.export import export_generator, load_generator
    model, *_ = trained
    meta = ExportMeta(buffer=model.buffer, outdimsize=model.outdimsize,
                      meanstd_x=(0.0, 1.0), meanstd_y=(0.0, 1.0),
                      dimsize=74, is3d=False, wf=32)
    export_generator(model.state.gg, meta, str(tmp_path / "m"))
    gen2, params2, meta2 = load_generator(str(tmp_path / "m"))
    x = jnp.zeros((1, 74, 74, 1))
    np.testing.assert_array_equal(np.asarray(model.predict(x)),
                                  np.asarray(gen2.apply(params2, x)))


def test_restore_from_explicit_path_other_experiment(trained, tmp_path):
    """Reference cgan.py:98-100 restores ANY explicit checkpoint prefix,
    including another experiment's — the contract save_model relies on
    (utils.py:140-149).  A fresh EM2EM under a different exp_name restores
    from the trained model's checkpoint PATH bit-exactly."""
    model, ckroot, *_ = trained
    step = int(model._ckpt_mgr.latest_step())
    path = os.path.join(ckroot, "train_e2e_test", str(step))
    other = EM2EM(74, "restore_path_other", is3d=False, wf=32,
                  checkpoint_root=str(tmp_path / "ck2"), ckpt_restore=path)
    for a, b in zip(jax.tree.leaves(model.state.gg),
                    jax.tree.leaves(other.state.gg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loss_decreases_on_warp_fixture(tmp_path):
    """SURVEY §4 fixture: training on the warp-corrupted domain must reduce
    the cycle loss within a few dozen steps (fixed seeds -> deterministic)."""
    rng = np.random.default_rng(1)
    patches = make_patches(rng, n=8)
    target_ds, _ = create_dataset_from_tensors(
        patches, batch_size=4, enable_augmentation=False, seed=1)
    source_ds, _ = create_dataset_from_tensors(
        patches, batch_size=4, custom_map=warp, enable_augmentation=False,
        seed=2)
    model = EM2EM(74, "loss_decrease", is3d=False, wf=32,
                  checkpoint_root=str(tmp_path / "ck"), seed=3)
    hist = []
    for _ in range(100):  # 200 steps: GAN warm-up plateaus ~120 steps, then
        for bx, by in zip(source_ds, target_ds):  # cycle loss collapses
            hist.append(np.asarray(model.train_step(bx, by)))
    h = np.stack(hist)
    first, last = h[:20, 6].mean(), h[-20:, 6].mean()
    # measured trajectory: ~5.1 -> ~0.19 (see PERF-era probe); require 2x
    assert last < first * 0.5, (first, last)


def test_train_scan_window_matches_sequential(tmp_path):
    """EM2EM.train(scan_window=2) — one dispatch per 2 steps, tail through
    the per-step path — lands on the same parameters as the plain loop
    (same seed, same batches, same per-step fold_in keys)."""
    rng = np.random.default_rng(5)
    patches = make_patches(rng, n=6)
    target_ds, _ = create_dataset_from_tensors(
        patches, batch_size=2, enable_augmentation=False, seed=1)
    source_ds, _ = create_dataset_from_tensors(
        patches, batch_size=2, custom_map=warp, enable_augmentation=False,
        seed=2)

    def run(name, **kw):
        m = EM2EM(74, name, is3d=False, wf=32,
                  checkpoint_root=str(tmp_path / name), seed=9)
        m.train(source_ds, target_ds, epochs=1, check_freq=10, **kw)
        return m

    plain = run("scanwin_plain")
    scanned = run("scanwin_scan", scan_window=2)  # 3 batches -> window + tail
    assert int(plain.state.step) == int(scanned.state.step) == 3
    for a, b in zip(jax.tree.leaves(plain.state), jax.tree.leaves(scanned.state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_scan_window_ragged_batches(tmp_path):
    """A user iterable WITHOUT drop_remainder can yield a smaller final
    batch; the scan path must flush the partial window through the per-step
    path instead of crashing on jnp.stack."""
    rng = np.random.default_rng(11)
    # (2,1,2): the mid-stream shape change exercises the flush branch, the
    # trailing batch exercises the epoch tail.
    xs = [rng.normal(size=(b, 74, 74, 1)).astype(np.float32)
          for b in (2, 1, 2)]
    ys = [rng.normal(size=(b, 74, 74, 1)).astype(np.float32)
          for b in (2, 1, 2)]
    m = EM2EM(74, "scanwin_ragged", is3d=False, wf=32,
              checkpoint_root=str(tmp_path / "ck"), seed=4)
    m.train(xs, ys, epochs=1, check_freq=10, scan_window=2)
    assert int(m.state.step) == 3  # all three batches trained


def test_train_metrics_flushed_when_ckpt_drain_raises(tmp_path):
    """If draining the async checkpoint writer in train()'s finally block
    raises (e.g. the orbax writer itself failed), the metrics JSONL must
    still be closed/flushed (ADVICE r3: nested try/finally)."""
    from transfer_em_tpu.train import metrics as metrics_mod

    closed = []
    orig_close = metrics_mod.MetricsLogger.close

    def spy_close(self):
        closed.append(True)
        orig_close(self)

    rng = np.random.default_rng(13)
    xs = [rng.normal(size=(2, 74, 74, 1)).astype(np.float32)]
    m = EM2EM(74, "drainfail", is3d=False, wf=32,
              checkpoint_root=str(tmp_path / "ck"), seed=5)

    def boom():
        raise RuntimeError("async writer failed")

    m.wait_until_finished = boom
    log = str(tmp_path / "metrics.jsonl")
    metrics_mod.MetricsLogger.close = spy_close
    try:
        with pytest.raises(RuntimeError, match="async writer failed"):
            m.train(xs, xs, epochs=1, check_freq=999, metrics_log=log)
    finally:
        metrics_mod.MetricsLogger.close = orig_close
    assert closed, "logger.close() skipped when the ckpt drain raised"
    with open(log) as f:
        assert len(f.read().strip().splitlines()) == 1
