"""Golden parity vs frozen TF-reference outputs (TF not required).

tests/goldens/*.npz were generated once from janelia-flyem/transfer_em with
TF (script in repo history: .dev/gen_goldens.py): reference weights in build
order, a fixed input, and the reference's output.  These tests load the same
weights into our Flax models and require outputs within 1e-3 / PSNR >= 40 dB
(BASELINE.md fidelity bar) — they run in every environment, unlike
test_tf_parity.py which needs TF + /root/reference.
"""

import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transfer_em_tpu.models import Discriminator, UNetGenerator

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    data = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    weights = []  # [(layer_index, weight_index, type_name, array)]
    for k in data.files:
        m = re.match(r"w_(\d+)_(\d+)_(.+)", k)
        if m:
            weights.append((int(m.group(1)), int(m.group(2)), m.group(3),
                            data[k]))
    weights.sort(key=lambda t: (t[0], t[1]))
    return data["x"], data["y"], weights


GEN_ORDER = [("stem", None), ("down1", "conv"), ("down1", "down"),
             ("down2", "conv"), ("down2", "down"), ("up1", "conv"),
             ("up1", "up"), ("mid", None), ("up0", "conv"), ("up0", "up"),
             ("head", None), ("out", None)]


def _assign(params, order, weights):
    p = jax.tree.map(lambda v: v, params["params"])
    groups = {}
    for li, wi, tname, arr in weights:
        groups.setdefault(li, []).append((tname, arr))
    assert len(groups) == len(order), (len(groups), len(order))
    for (path, sub), li in zip(order, sorted(groups)):
        tgt = p[path] if sub is None else p[path][sub]
        for tname, arr in groups[li]:
            if arr.ndim >= 4:  # conv kernel
                if "Transpose" in tname:
                    arr = np.swapaxes(arr, -1, -2)
                assert tgt["kernel"].shape == arr.shape, (path, sub, tname,
                                                          tgt["kernel"].shape,
                                                          arr.shape)
                tgt["kernel"] = arr
            else:
                tgt["bias"] = arr
    return {"params": p}


def _check(got, want):
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    mse = np.mean((got - want) ** 2)
    peak = max(want.max() - want.min(), 1e-6)
    psnr = 10 * np.log10(peak ** 2 / max(mse, 1e-20))
    assert psnr >= 40, psnr


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_generator_golden(tag):
    x, want, weights = _load(f"gen_{tag}")
    gen = UNetGenerator(wf=8)
    params = gen.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _assign(params, GEN_ORDER, weights)
    got = np.asarray(gen.apply(params, jnp.asarray(x)))
    _check(got, want)


@pytest.mark.parametrize("tag", ["2d", "3d"])
def test_discriminator_golden(tag):
    x, want, weights = _load(f"disc_{tag}")
    is3d = tag == "3d"
    disc = Discriminator(is3d=is3d, wf=8)
    params = disc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    if is3d:
        order = [("down1", "conv"), ("down1", "down"), ("hack", None),
                 ("down2", "conv"), ("down2", "down"),
                 ("down3", "conv"), ("down3", "down"),
                 ("head", None), ("out", None)]
    else:
        order = [("hack", None), ("down2", "conv"), ("down2", "down"),
                 ("down3", "conv"), ("down3", "down"),
                 ("head", None), ("out", None)]
    params = _assign(params, order, weights)
    got = np.asarray(disc.apply(params, jnp.asarray(x)))
    _check(got, want)
