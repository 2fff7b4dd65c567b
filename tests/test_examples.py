"""Smoke-test the example recipes (tiny configs, CPU)."""

import sys

import numpy as np
import pytest


def test_streaming_training_3d_local(tmp_path, monkeypatch):
    """Recipe 2b: HTTP-streamed 3D training end-to-end, zero cloud deps."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        import streaming_training_3d_local as ex
    finally:
        sys.path.remove("/root/repo/examples")
    rmse = ex.main(epochs=1, wf=32, batch_size=1, epoch_size=2, extent=100,
                   exp_name="stream3d_smoke")
    assert np.isfinite(rmse)


def test_cloudrun_test_3d(tmp_path, monkeypatch):
    """Recipe 4: data service over HTTP + the reference notebook's
    overlap-stitching sanity check (3dcloudrun_test.ipynb cell 11)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        import cloudrun_test_3d as ex
    finally:
        sys.path.remove("/root/repo/examples")
    ex.main()  # asserts the stitching invariant internally


def test_run_cloud_predict_service(tmp_path, monkeypatch):
    """Recipe 5: full local serving stack — data service + 64-aligned model
    service + AI-Platform-style predictor."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        import run_cloud_predict_service as ex
    finally:
        sys.path.remove("/root/repo/examples")
    ex.main()


def test_simple_training_2d(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo/examples")
    try:
        import simple_training_2d as ex
    finally:
        sys.path.remove("/root/repo/examples")
    ex.main(epochs=1, wf=32, batch_size=4, n_patches=8)
    assert (tmp_path / "simple2d_sample.png").exists()
    assert (tmp_path / "simple2d_metrics.jsonl").exists()
