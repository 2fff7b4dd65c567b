"""Shape-calculus unit tests (reference generator.py:48-115 arithmetic)."""

import pytest

from transfer_em_tpu.shapes import (
    DiscriminatorShapes, GeneratorShapes, conv_out, discriminator_shapes,
    generator_shapes, is_valid_dimsize, tile_plan_outdimsize, valid_dimsizes,
)


def test_conv_out():
    assert conv_out(74, 3, 1) == 72
    assert conv_out(70, 4, 2) == 34
    assert conv_out(15, 4, 2) == 6  # floor division


def test_generator_74_matches_reference_trace():
    s = generator_shapes(74)
    assert (s.stem, s.skip0, s.down1, s.skip1, s.down2) == (72, 70, 34, 32, 15)
    assert (s.up1, s.mid, s.up0, s.head, s.out) == (26, 24, 44, 42, 40)
    assert s.buffer == 17


def test_validity_includes_74_and_steps_of_4():
    dims = valid_dimsizes(20, 200)
    assert 74 in dims
    # VALID U-Net sizes recur every 4 (one bottleneck voxel = 4 input voxels).
    assert all(b - a == 4 for a, b in zip(dims, dims[1:]))


def test_invalid_dims_rejected():
    assert not is_valid_dimsize(75)
    assert not is_valid_dimsize(73)
    assert not is_valid_dimsize(10)


def test_discriminator_trace():
    s3 = discriminator_shapes(40, is3d=True)
    assert (s3.down1, s3.hack, s3.down2, s3.down3) == (18, 16, 6, 1)
    s2 = discriminator_shapes(40, is3d=False)
    assert (s2.hack, s2.down2, s2.down3) == (38, 17, 6)


def test_tile_plan_multiple_of_6():
    # 40 -> 36, tpad 2, buffer 17 -> 19 (reference utils.py:70-75)
    out, buf, tpad = tile_plan_outdimsize(40, 17)
    assert (out, buf, tpad) == (36, 19, 2)
    out, buf, tpad = tile_plan_outdimsize(36, 17)
    assert (out, buf, tpad) == (36, 17, 0)


def test_all_valid_dims_have_even_crops():
    for d in valid_dimsizes(30, 150):
        s = generator_shapes(d)
        assert s.crop0 % 2 == 0 and s.crop1 % 2 == 0
        assert (d - s.out) % 2 == 0
