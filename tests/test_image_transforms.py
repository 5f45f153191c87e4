"""Loader-side transform pipelines (dfmir_tpu.data.image_transforms) —
capability parity with /root/reference/util/image_transforms.py:32-780:
seg-aware Compose with exact inverses, intensity normalizations,
RandomCropManyImages, diffeomorphic + rotation augmentation."""

import numpy as np
import pytest

from dfmir_tpu.data.image_transforms import (
    AffineParams, Compose, Compose_DA, CropParams, DeMean,
    NonLinearDifferomorphismManyImages, NonLinearParams, Normalization,
    NormalNormalization, PadParams, Padding, RandomCropManyImages,
    ResizeParams, Rotation, RotationParams, ScaleNormalization,
)


def test_padding_centers_and_inverts(rng):
    img = rng.standard_normal((5, 8))
    p = Padding(PadParams((9, 8)), img.shape)
    out = p(img)
    assert out.shape == (9, 8)
    # odd margin: floor 2 above, ceil 2 below (4 rows split 2/2)
    np.testing.assert_array_equal(out[2:7], img)
    np.testing.assert_array_equal(p.inverse(out, img.shape), img)


def test_padding_channel_axis(rng):
    img = rng.standard_normal((5, 6, 3))
    out = Padding(PadParams((8, 8)), img.shape[:2])(img)
    assert out.shape == (8, 8, 3)


def test_random_crop_many_images_center_and_shared(rng):
    a = rng.standard_normal((10, 12))
    b = (rng.random((10, 12)) > 0.5).astype(np.int32)
    crop = RandomCropManyImages(CropParams((6, 6)))
    ca, cb = crop([a, b])
    assert ca.shape == cb.shape == (6, 6)
    # center crop, SAME window for both arrays of the sample
    np.testing.assert_array_equal(ca, a[2:8, 3:9])
    np.testing.assert_array_equal(cb, b[2:8, 3:9])


def test_random_crop_pad_if_needed(rng):
    small = rng.standard_normal((4, 9))
    out, = RandomCropManyImages(CropParams((6, 6)))([small])
    assert out.shape == (6, 6)


def test_random_crop_inverse_restores_geometry(rng):
    a = rng.standard_normal((10, 12))
    crop = RandomCropManyImages(CropParams((6, 6)))
    ca, = crop([a])
    back, = crop.inverse([ca], [a.shape])
    assert back.shape == a.shape
    np.testing.assert_array_equal(back[2:8, 3:9], a[2:8, 3:9])


def test_compose_pipeline_and_shape_computation(rng):
    a = rng.standard_normal((20, 20))
    seg = rng.integers(0, 4, (20, 20))
    c = Compose([CropParams((12, 12)), PadParams((16, 16))])
    out = c([a, seg])
    assert out[0].shape == out[1].shape == (16, 16)
    assert c._compute_data_shape([(20, 20), (20, 20)]) == [(16, 16)] * 2
    inv = c.inverse(out)
    assert inv[0].shape == (20, 20)
    np.testing.assert_array_equal(inv[0][4:16, 4:16], a[4:16, 4:16])


def test_compose_resize(rng):
    a = rng.standard_normal((16, 16))
    out, = Compose([ResizeParams((8, 8))])([a])
    assert out.shape == (8, 8)
    # corner-aligned resize keeps the corners exactly
    assert out[0, 0] == pytest.approx(a[0, 0])
    assert out[-1, -1] == pytest.approx(a[-1, -1])


def test_scale_normalization_range_and_mask(rng):
    data = rng.random((8, 8)) * 100
    out = ScaleNormalization(range=(-1, 1))(data)
    assert out.min() == pytest.approx(-1) and out.max() == pytest.approx(1)
    # masked: statistics from foreground only, clipped to range
    mask = np.zeros((8, 8)); mask[2:6, 2:6] = 1
    out2 = ScaleNormalization(range=(0, 1))(data, mask=mask)
    assert out2.min() >= 0 and out2.max() <= 1
    sub = out2[2:6, 2:6]
    assert sub.min() == pytest.approx(0) and sub.max() == pytest.approx(1)
    # quantile contrast mode clips the tails
    out3 = ScaleNormalization(range=(0, 1), quantile=True)(data)
    assert (out3 == 0).any() and (out3 == 1).any()
    # scale mode multiplies
    np.testing.assert_allclose(ScaleNormalization(scale=2.0)(data),
                               data * 2)
    assert ScaleNormalization(range=(-1, 1)).get_mask_value(data) == -1


def test_normalization_chain(rng):
    data = rng.random((8, 8)) * 50 + 10
    out = Normalization([DeMean(), NormalNormalization()])(data)
    assert abs(out.mean()) < 1e-9
    assert out.std() == pytest.approx(1.0, abs=1e-9)


def test_compose_da_diffeomorphism_seg_aware(rng):
    img = rng.standard_normal((32, 32))
    seg = rng.integers(0, 5, (32, 32)).astype(np.float64)
    da = Compose_DA([NonLinearParams((4, 4), lowres_strength=(1.0, 3.0),
                                     nstep=4)],
                    rng=np.random.default_rng(0))
    out_img, out_seg = da([img, seg], mask_flag=[False, True])
    assert out_img.shape == img.shape and out_seg.shape == seg.shape
    # nearest resampling: label values survive exactly
    assert set(np.unique(out_seg)) <= set(np.unique(seg))
    # the field actually moved something
    assert np.abs(out_img - img).max() > 1e-3


def test_diffeomorphism_output_flow(rng):
    img = rng.standard_normal((16, 16))
    tf = NonLinearDifferomorphismManyImages(
        NonLinearParams((4, 4), lowres_strength=(0.5, 1.0), nstep=3),
        output_flow=True, rng=np.random.default_rng(1))
    out, flow = tf([img], [False])
    assert flow.shape == (2, 16, 16)
    assert out[0].shape == img.shape


def test_zero_strength_deformation_is_identity(rng):
    img = rng.standard_normal((16, 16))
    da = Compose_DA([NonLinearParams((4, 4), lowres_strength=0.0,
                                     distribution=None, nstep=3)])
    out = da(img)   # non-list input round-trips (reference :350-353)
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_rotation_zero_identity_and_label_safety(rng):
    img = rng.standard_normal((16, 16))
    seg = rng.integers(0, 3, (16, 16)).astype(np.float64)
    rot0 = Rotation(RotationParams(0.0, distribution=None))
    out_img, out_seg = rot0([img, seg], [False, True])
    np.testing.assert_allclose(out_img, img, atol=1e-9)
    np.testing.assert_array_equal(out_seg, seg)


def test_rotation_round_trip():
    # smooth image: bilinear round-trip error stays small (iid noise would
    # not survive two resamplings)
    y, x = np.meshgrid(np.arange(24.0), np.arange(24.0), indexing="ij")
    img = np.sin(x / 4.0) * np.cos(y / 5.0)
    f = Rotation(RotationParams(20.0, distribution=None))([img], [False])[0]
    b = Rotation(RotationParams(-20.0, distribution=None))([f], [False])[0]
    # away from borders the two rotations cancel to interpolation error
    assert np.abs(b[8:16, 8:16] - img[8:16, 8:16]).max() < 0.05


def test_rotation_dense_field(rng):
    img = rng.standard_normal((12, 12))
    out, shift = Rotation(RotationParams(15.0, distribution=None),
                          dense_field=True)([img], [False])
    assert shift.shape == (2, 12, 12)
    # centered rotation: zero displacement at the center point
    assert np.abs(shift[:, 5:7, 5:7]).min() < 1.0


def test_affine_params_matrix_properties():
    ap = AffineParams(rotation=[10.0], scaling=[0.05, 0.05],
                      translation=[2.0, 2.0])
    M = ap.get_affine((32, 32), rng=np.random.default_rng(0))
    assert M.shape == (3, 3)
    np.testing.assert_allclose(M[2], [0, 0, 1])
    # linear part is rotation@scale: determinant = product of scales
    det = np.linalg.det(M[:2, :2])
    assert 0.9 ** 2 < det < 1.1 ** 2


def test_affine_params_3d():
    ap = AffineParams(rotation=[5.0, 5.0, 5.0], scaling=[0.1] * 3,
                      translation=[1.0] * 3)
    M = ap.get_affine((16, 16, 16), rng=np.random.default_rng(0))
    assert M.shape == (4, 4)
    np.testing.assert_allclose(M[3], [0, 0, 0, 1])


def test_nonlinear_params_3d_sampler():
    p = NonLinearParams((4, 4, 4), lowres_strength=(0.5, 1.0))
    fields = p.get_lowres_strength(ndim=3, rng=np.random.default_rng(0))
    assert len(fields) == 3 and fields[0].shape == (4, 4, 4)
