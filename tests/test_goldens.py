"""Golden parity vs frozen TF-reference outputs (TF not required).

tests/goldens/*.npz were generated once from janelia-flyem/transfer_em with
TF (script in repo history: .dev/gen_goldens.py): reference weights in build
order, a fixed input, and the reference's output.  These tests load the same
weights into our Flax models and require outputs within 1e-3 / PSNR >= 40 dB
(BASELINE.md fidelity bar) — they run in every environment, unlike
test_tf_parity.py which needs TF + /root/reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden_utils import (DISC_ORDER_2D, DISC_ORDER_3D, GEN_ORDER,
                          assign_weights, load_golden, psnr)
from transfer_em_tpu.models import Discriminator, UNetGenerator


def _check(got, want):
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    assert psnr(got, want) >= 40


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_generator_golden(tag):
    x, want, weights = load_golden(f"gen_{tag}")
    gen = UNetGenerator(wf=8)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = assign_weights(params, GEN_ORDER, weights)
    got = np.asarray(gen.apply(params, jnp.asarray(x)))
    _check(got, want)


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_discriminator_golden(tag):
    x, want, weights = load_golden(f"disc_{tag}")
    is3d = tag == "3d"
    disc = Discriminator(is3d=is3d, wf=8)
    params = disc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    order = DISC_ORDER_3D if is3d else DISC_ORDER_2D
    params = assign_weights(params, order, weights)
    got = np.asarray(disc.apply(params, jnp.asarray(x)))
    _check(got, want)
