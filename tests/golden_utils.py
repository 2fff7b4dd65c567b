"""Shared helpers for the frozen TF-reference goldens (tests/goldens/*.npz).

Used by tests/test_goldens.py (parity gate) and bench_fidelity.py (the
fidelity benchmark line).  The fixtures were generated once from
janelia-flyem/transfer_em with TF: reference weights in build order, a fixed
input, and the reference's output.
"""

import os
import re

import jax
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")

GEN_ORDER = [("stem", None), ("down1", "conv"), ("down1", "down"),
             ("down2", "conv"), ("down2", "down"), ("up1", "conv"),
             ("up1", "up"), ("mid", None), ("up0", "conv"), ("up0", "up"),
             ("head", None), ("out", None)]

DISC_ORDER_3D = [("down1", "conv"), ("down1", "down"), ("hack", None),
                 ("down2", "conv"), ("down2", "down"),
                 ("down3", "conv"), ("down3", "down"),
                 ("head", None), ("out", None)]

DISC_ORDER_2D = [("hack", None), ("down2", "conv"), ("down2", "down"),
                 ("down3", "conv"), ("down3", "down"),
                 ("head", None), ("out", None)]


def load_golden(name):
    """Return (input x, reference output y, ordered weight list)."""
    data = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    weights = []  # [(layer_index, weight_index, type_name, array)]
    for k in data.files:
        m = re.match(r"w_(\d+)_(\d+)_(.+)", k)
        if m:
            weights.append((int(m.group(1)), int(m.group(2)), m.group(3),
                            data[k]))
    weights.sort(key=lambda t: (t[0], t[1]))
    return data["x"], data["y"], weights


def assign_weights(params, order, weights):
    """Load reference weights (TF build order) into our Flax param tree."""
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


def psnr(got, want):
    """PSNR (dB) with the reference output's dynamic range as peak."""
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    mse = np.mean((got - want) ** 2)
    peak = max(want.max() - want.min(), 1e-6)
    return 10 * np.log10(peak ** 2 / max(mse, 1e-20))
