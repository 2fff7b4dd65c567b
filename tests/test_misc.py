"""Config round-trip, prior helper, plotting, metrics logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.config import CycleGANConfig, ExportMeta
from transfer_em_tpu.train import LOSS_NAMES, MetricsLogger, StepTimer


def test_config_json_roundtrip():
    cfg = CycleGANConfig(dimsize=78, is3d=False, wf=4, focal_gamma=3.0,
                         compute_dtype="bfloat16", batch_size=16)
    cfg2 = CycleGANConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_export_meta_roundtrip():
    m = ExportMeta(buffer=17, outdimsize=40, meanstd_x=(0.1, 0.2),
                   meanstd_y=(0.3, 0.4))
    m2 = ExportMeta.from_json(m.to_json())
    assert m2 == m
    # reference meta.json keys must be present (utils.py:158-166)
    d = json.loads(m.to_json())
    for k in ("buffer", "outdimsize", "meanstd_x", "meanstd_y"):
        assert k in d


def test_create_prior_helper(tmp_path):
    from transfer_em_tpu.infer.export import export_generator
    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.train import create_prior_helper

    gen = UNetGenerator(wf=32)
    x = jnp.zeros((1, 74, 74, 1))
    params = gen.init(jax.random.PRNGKey(0), x)
    meta = ExportMeta(buffer=17, outdimsize=40, meanstd_x=(0, 1),
                      meanstd_y=(0, 1), dimsize=74, is3d=False, wf=32)
    export_generator(params, meta, str(tmp_path / "m"))

    prior = create_prior_helper(str(tmp_path / "m"), "down1")
    out = prior(x)
    # down1 of a 74 input: 34 spatial (shapes trace), 64//32=2 channels
    assert out.shape == (1, 34, 34, 2)
    # Reference semantics (trainable=False, cgan.py:29): weights frozen,
    # but INPUT gradients flow — the generator's adversarial signal rides
    # through the prior branch (round-5 fix; the old output stop_gradient
    # severed it).
    xg = np.random.default_rng(0).normal(size=x.shape).astype(np.float32)
    g = jax.grad(lambda v: jnp.sum(prior(v) ** 2))(jnp.asarray(xg))
    g = np.asarray(g)
    assert np.all(np.isfinite(g)) and np.any(g != 0.0)
    # (Weight freezing is structural: the closure holds stop_gradient'd
    # leaves and the train step's grad argnums never include them.)

    with pytest.raises(KeyError):
        create_prior_helper(str(tmp_path / "m"), "nope")(x)


def test_plot_models(tmp_path):
    from transfer_em_tpu.train import EM2EM
    model = EM2EM(74, "plot_test", is3d=False, wf=32,
                  checkpoint_root=str(tmp_path / "ck"))
    txt = tmp_path / "gen.txt"
    model.plot_generator(str(txt))
    content = open(txt).read()
    assert "UNetGenerator" in content and "down1" in content
    model.plot_discriminator(str(tmp_path / "disc.txt"))
    assert "Discriminator" in open(tmp_path / "disc.txt").read()


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(p)
    lg.log_epoch(1, np.arange(7, dtype=np.float32), 2.5, 10)
    lg.log_epoch(2, np.arange(7, dtype=np.float32) * 2, 2.0, 10)
    lg.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 2
    assert lines[0]["epoch"] == 1
    assert set(lines[0]["loss"].keys()) == set(LOSS_NAMES)
    assert lines[1]["loss"]["cycle"] == 12.0


def test_step_timer():
    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.ema is not None and t.items_per_sec > 0

    # items= scales the rate: a 64-item batch in the same wall time must
    # report ~64x the items/sec of a 1-item step (round-5 review: the old
    # property ignored items and returned intervals/sec).
    import time as _time
    a, b = StepTimer(alpha=1.0), StepTimer(alpha=1.0)
    for timer, items in ((a, 1), (b, 64)):
        timer.start()
        _time.sleep(0.01)
        timer.stop(items=items)
    assert b.items_per_sec == pytest.approx(64 * a.items_per_sec, rel=0.5)


def test_profile_trace_writes(tmp_path):
    from transfer_em_tpu.train import profile_trace
    with profile_trace(str(tmp_path / "trace")):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
    files = list((tmp_path / "trace").rglob("*"))
    assert files, "no profiler artifacts written"


def test_em2em_with_disc_prior(tmp_path):
    """EM2EM trains with a frozen prior concatenated into disc_y
    (reference cgan.py:21-29 + discriminator.py:62-70)."""
    import numpy as np
    from transfer_em_tpu.infer.export import export_generator
    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.train import EM2EM, create_prior_helper

    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 1)))
    meta = ExportMeta(buffer=17, outdimsize=40, meanstd_x=(0, 1),
                      meanstd_y=(0, 1), dimsize=74, is3d=False, wf=32)
    export_generator(params, meta, str(tmp_path / "prior"))
    # down1 of a 40-input gives the 17^2 grid matching disc_y's down2 output
    prior = create_prior_helper(str(tmp_path / "prior"), "down1")

    model = EM2EM(74, "prior_test", is3d=False, wf=32, disc_prior=prior,
                  checkpoint_root=str(tmp_path / "ck"))
    # disc_y's down3 consumes down2's 256//wf channels + the prior's 64//wf
    base = 256 // 32
    got = model.state.dy["params"]["down3"]["conv"]["kernel"].shape[-2]
    assert got == base + 64 // 32, got
    # disc_x (no prior) stays at base width
    assert model.state.dx["params"]["down3"]["conv"]["kernel"].shape[-2] == base
    x = jnp.zeros((2, 74, 74, 1))
    loss = model.train_step(x, x)
    assert np.all(np.isfinite(np.asarray(loss)))


def test_save_model_cli_parsing(monkeypatch):
    """CLI arg wiring (reference bin/save_model.py argv order)."""
    from transfer_em_tpu.cli import save_model as cli
    calls = {}

    def fake(name, ckpt, msx, msy, size, is3d, wf=8):
        calls.update(name=name, ckpt=ckpt, msx=msx, msy=msy, size=size,
                     is3d=is3d, wf=wf)

    monkeypatch.setattr(cli, "save_model", fake)
    rc = cli.main(["m", "ck", "0.1", "0.2", "0.3", "0.4", "74", "1", "16"])
    assert rc == 0
    assert calls == dict(name="m", ckpt="ck", msx=(0.1, 0.2), msy=(0.3, 0.4),
                         size=74, is3d=True, wf=16)
    assert cli.main([]) == 1  # usage

    # --tf[=DIR] additionally exports a TF SavedModel (compat module).
    tf_calls = []
    import transfer_em_tpu.compat as compat
    monkeypatch.setattr(compat, "export_tf_savedmodel",
                        lambda src, dst: tf_calls.append((src, dst)))
    cli.main(["m", "ck", "0.1", "0.2", "0.3", "0.4", "74", "1", "16", "--tf"])
    cli.main(["m", "ck", "0.1", "0.2", "0.3", "0.4", "74", "0",
              "--tf=out_tf"])
    assert tf_calls == [("m", "m_tf"), ("m", "out_tf")]
    assert calls["is3d"] is False  # flag removed before positional parse

    # Unknown --options are rejected, not silently consumed ('--tft' typo
    # must not be treated as --tf).
    assert cli.main(["m", "ck", "0.1", "0.2", "0.3", "0.4", "74", "1", "16",
                     "--tft"]) == 1
    assert tf_calls == [("m", "m_tf"), ("m", "out_tf")]  # no new export


def test_bench_baseline_cache_read(tmp_path, monkeypatch):
    """bench.measure_tf_reference returns the committed cached baseline
    without importing TF."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import bench
    finally:
        sys.path.remove("/root/repo")
    v = bench.measure_tf_reference()
    assert v > 0.01  # measured reference TF CPU throughput (tiles/s)


def test_export_meta_reads_reference_style_json():
    """A reference-produced meta.json (only buffer/outdimsize/meanstd_*,
    utils.py:158-166) loads with our defaults for the added keys."""
    legacy = ('{"buffer": 17, "outdimsize": 40, '
              '"meanstd_x": [0.19801877, 0.1824518], '
              '"meanstd_y": [0.06743993, 0.37753862]}')
    m = ExportMeta.from_json(legacy)
    assert m.buffer == 17 and m.outdimsize == 40
    assert m.meanstd_x == (0.19801877, 0.1824518)
    assert m.dimsize == 74 and m.is3d is True and m.wf == 8


def test_reference_named_network_attributes(tmp_path):
    """The reference exposes the four networks as callable model attributes
    (cgan.py:58-62); ours are BoundModel views over the LIVE training params
    (generator calls == predict/predict_f exactly)."""
    import jax.numpy as jnp
    import numpy as np

    from transfer_em_tpu.train import EM2EM

    model = EM2EM(74, "attr_test", is3d=False, wf=32,
                  checkpoint_root=str(tmp_path / "ck"))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 74, 74, 1)).astype(np.float32))
    yg = model.generator_g(x)
    np.testing.assert_array_equal(np.asarray(yg), np.asarray(model.predict(x)))
    np.testing.assert_array_equal(np.asarray(model.generator_f(x)),
                                  np.asarray(model.predict_f(x)))
    assert model.discriminator_x(yg).shape == model.discriminator_y(yg).shape
    # Live view: the params property always reads the current state.
    assert model.generator_g.params is model.state.gg
    assert model.generator_g.module is model.gen
    # Discriminator views ride a jitted shared apply (no eager per-op
    # dispatch per call) and match the raw module.apply output exactly.
    assert model.discriminator_x._apply is model._disc_x_apply
    assert model.discriminator_y._apply is model._disc_y_apply
    np.testing.assert_array_equal(
        np.asarray(model.discriminator_x(yg)),
        np.asarray(model.disc_x_model.apply(model.state.dx, yg)))
