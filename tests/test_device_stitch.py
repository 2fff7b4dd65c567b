"""Device-resident stitching == host-path tiled inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.infer.device_stitch import device_predict_tiled
from transfer_em_tpu.infer.tiling import predict_tiled
from transfer_em_tpu.models import UNetGenerator
from transfer_em_tpu.native import gather_blocks


@pytest.fixture(scope="module")
def setup():
    gen = UNetGenerator(wf=32)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    rng = np.random.default_rng(4)
    vol = rng.integers(0, 255, size=(160, 160, 160), dtype=np.uint8)
    return gen, params, vol


def test_device_stitch_matches_host_path(setup):
    gen, params, vol = setup
    apply_fn = lambda p, x: gen.apply(p, x)
    ms_x, ms_y = (0.1, 0.9), (0.05, 1.1)

    def fetch_tile(corner, insize):
        return gather_blocks(vol, [corner], insize)[0]

    want = predict_tiled(fetch_tile, apply_fn, params, (40, 40, 40),
                         (72, 36, 36), 40, 17, ms_x, ms_y, batch_size=3)
    got = device_predict_tiled(vol, apply_fn, params, (40, 40, 40),
                               (72, 36, 36), 40, 17, ms_x, ms_y,
                               batch_size=3)
    assert got.shape == want.shape == (36, 36, 72)
    np.testing.assert_array_equal(got, want)


def test_device_stitch_single_tile(setup):
    gen, params, vol = setup
    apply_fn = lambda p, x: gen.apply(p, x)
    got = device_predict_tiled(vol, apply_fn, params, (40, 40, 40),
                               (36, 36, 36), 40, 17, (0, 1), (0, 1),
                               batch_size=8)
    assert got.shape == (36, 36, 36)
