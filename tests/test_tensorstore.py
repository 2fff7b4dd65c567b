"""Tensorstore transports zero-fill out-of-domain reads.

corner_stream legitimately samples cubes overhanging the volume edge (its
docstring; reference generators.py:84-108 never subtracts size), and tiled
inference reads halos past the edge — but tensorstore raises OutOfRange on
any out-of-domain slice (the reference's own tensorstore path would crash,
generators.py:139-142).  Both our tensorstore consumers clamp + zero-fill:
data.sources.volume3d_ng (training fetch) and serve.backends
.TensorstoreVolume (data-service backend), matching DVID's server-side
zero-fill and NumpyVolume.
"""

import numpy as np
import pytest

ts = pytest.importorskip("tensorstore")


@pytest.fixture(scope="module")
def ng_volume(tmp_path_factory):
    """A 16^3 uint8 neuroglancer-precomputed volume on disk; returns
    (location, data_xyz)."""
    d = tmp_path_factory.mktemp("ngvol")
    spec = {
        "driver": "neuroglancer_precomputed",
        "kvstore": {"driver": "file", "path": str(d)},
        "scale_metadata": {"size": [16, 16, 16], "resolution": [8, 8, 8],
                           "chunk_size": [8, 8, 8], "encoding": "raw"},
        "multiscale_metadata": {"data_type": "uint8", "num_channels": 1,
                                "type": "image"},
        "create": True,
    }
    dsn = ts.open(spec).result()
    rng = np.random.default_rng(0)
    data = rng.integers(1, 255, size=(16, 16, 16), dtype=np.uint8)  # xyz
    dsn[...] = data[..., None]
    return "file://" + str(d), data


def _one(src):
    return next(iter(src()))


def test_volume3d_ng_interior_read(ng_volume):
    from transfer_em_tpu.data.sources import volume3d_ng
    loc, data = ng_volume
    cube = _one(volume3d_ng(loc, size=8, array=[(2, 3, 4)], num_threads=1))
    np.testing.assert_array_equal(cube, data[2:10, 3:11, 4:12])


def test_volume3d_ng_zero_fills_overhang(ng_volume):
    from transfer_em_tpu.data.sources import volume3d_ng
    loc, data = ng_volume
    cube = _one(volume3d_ng(loc, size=12, array=[(8, 8, 8)], num_threads=1))
    assert cube.shape == (12, 12, 12)
    np.testing.assert_array_equal(cube[:8, :8, :8], data[8:, 8:, 8:])
    assert not cube[8:].any() and not cube[:, 8:].any() \
        and not cube[:, :, 8:].any()


def test_volume3d_ng_zero_fills_negative_and_disjoint(ng_volume):
    from transfer_em_tpu.data.sources import volume3d_ng
    loc, data = ng_volume
    cube = _one(volume3d_ng(loc, size=8, array=[(-4, -4, -4)],
                            num_threads=1))
    np.testing.assert_array_equal(cube[4:, 4:, 4:], data[:4, :4, :4])
    assert not cube[:4].any() and not cube[:, :4].any() \
        and not cube[:, :, :4].any()
    assert not _one(volume3d_ng(loc, size=4, array=[(-20, 0, 0)],
                                num_threads=1)).any()


def test_tensorstore_backend_rejects_non_uint8(tmp_path):
    """The serving byte contract is uint8-only (reference cloudrun_functions/
    transferem.py:146-180); a non-uint8 source must be rejected at open time,
    not silently truncated mod-256 into the uint8 read buffer."""
    from transfer_em_tpu.serve.backends import TensorstoreVolume
    spec = {
        "driver": "neuroglancer_precomputed",
        "kvstore": {"driver": "file", "path": str(tmp_path)},
        "create": True,
        "schema": {"dtype": "uint16", "domain": {"shape": [8, 8, 8, 1]},
                   "chunk_layout": {"chunk": {"shape": [8, 8, 8, 1]}}},
    }
    w = ts.open(spec).result()
    w[...] = np.full((8, 8, 8, 1), 300, np.uint16)  # would truncate to 44
    with pytest.raises(ValueError, match="uint8-only"):
        TensorstoreVolume("file://" + str(tmp_path))


def test_tensorstore_backend_matches_numpy_backend(ng_volume):
    """TensorstoreVolume.read == NumpyVolume.read over the same voxels for
    interior, overhanging, and negative-corner requests (zyx out, byte
    contract of the data service)."""
    from transfer_em_tpu.serve.backends import NumpyVolume, TensorstoreVolume
    loc, data = ng_volume
    tsv = TensorstoreVolume(loc)
    npv = NumpyVolume(np.ascontiguousarray(data.transpose(2, 1, 0)))
    for start, size in [((2, 3, 4), (8, 7, 6)),
                        ((8, 8, 8), (12, 12, 12)),
                        ((-4, 10, 12), (8, 8, 8)),
                        ((-20, 0, 0), (4, 4, 4))]:
        np.testing.assert_array_equal(tsv.read(start, size),
                                      npv.read(start, size),
                                      err_msg=f"{start} {size}")


def test_predict_ng_cube_direct_tensorstore_edge_request(ng_volume):
    """predict_ng_cube's DIRECT tensorstore transport (cloudrun=None) must
    clamp halo reads to the volume domain and zero-fill the rest: every
    edge-touching request plans fetch corners at start-buffer (negative /
    past the far face), where an unclamped slice raises OutOfRange.  The
    result must equal predict_tiled over a zero-filling host fetcher on the
    same data."""
    import jax
    import jax.numpy as jnp

    from transfer_em_tpu.infer.tiling import predict_ng_cube, predict_tiled
    from transfer_em_tpu.models import UNetGenerator
    from transfer_em_tpu.native import gather_box

    location, data = ng_volume
    gen = UNetGenerator(wf=4)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 74, 74, 74, 1)))
    ms = ((0.1, 0.9), (0.05, 1.1))
    vol_zyx = np.ascontiguousarray(data.transpose(2, 1, 0))

    def fetch_tile(corner, insize):
        return gather_box(vol_zyx, corner, (insize,) * 3)

    got = predict_ng_cube(location, (0, 0, 0), (16, 16, 16),
                          (gen.apply, params), *ms, None,
                          outdimsize=40, buffer=17)
    want = predict_tiled(fetch_tile, gen.apply, params, (0, 0, 0),
                         (16, 16, 16), 40, 17, *ms)
    np.testing.assert_array_equal(got, want)
