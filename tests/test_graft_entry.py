"""Driver entry points stay healthy: entry() traces, dryrun_multichip runs."""

import sys

import jax
import pytest


def _load():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
        return g
    finally:
        sys.path.remove("/root/repo")


def test_entry_traces():
    g = _load()
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)  # trace only — no CPU conv3d execution
    assert out.shape == (1, 40, 40, 40, 1)


def test_dryrun_multichip_eight():
    g = _load()
    assert jax.device_count() >= 8
    g.dryrun_multichip(8)
