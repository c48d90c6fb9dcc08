"""Behavioral tests for the pipeline-zoo tail (crop / loading /
formatting / affine transforms, vmg_tpu.edit.pipelines_extra), including
oracle checks against the reference implementations where they run
standalone (RandomAffine matrix, GetSpatialDiscountMask,
GenerateFrameIndiceswithPadding)."""

import os

import numpy as np
import cv2
import pytest

from vmg_tpu.edit import pipelines_extra as X
from vmg_tpu.edit.registry import PIPELINES


def _img(h=32, w=32, c=3, seed=0):
    return (np.random.default_rng(seed).random((h, w, c)) * 255
            ).astype(np.float32)


def test_all_reference_transforms_registered():
    """Every transform class of the reference pipelines package has a
    counterpart in the PIPELINES registry."""
    import vmg_tpu.edit  # noqa: F401  (registers everything)

    ref_names = set()
    base = "/root/reference/mmedit/datasets/pipelines"
    for fname in os.listdir(base):
        if not fname.endswith(".py"):
            continue
        for line in open(os.path.join(base, fname)):
            if line.startswith("class "):
                ref_names.add(line.split("class ")[1].split("(")[0]
                              .split(":")[0].strip())
    ref_names.discard("Compose")  # ours lives in pipelines.Compose
    missing = sorted(n for n in ref_names if n not in PIPELINES)
    assert not missing, f"unregistered reference transforms: {missing}"


def test_crop_random_and_center():
    res = {"img": _img(40, 50), "rng": np.random.default_rng(0)}
    out = X.Crop(keys=["img"], crop_size=(16, 20))(dict(res))
    assert out["img"].shape == (16, 20, 3)
    x, y, cw, ch = out["img_crop_bbox"]
    assert (cw, ch) == (20, 16)
    out_c = X.Crop(keys=["img"], crop_size=(16, 20), random_crop=False)(
        dict(res))
    assert out_c["img_crop_bbox"][:2] == [15, 12]


def test_fixed_crop_pairs():
    a, b = _img(seed=1), _img(seed=2)
    res = {"a": a, "b": b, "rng": np.random.default_rng(3)}
    out = X.FixedCrop(keys=["a", "b"], crop_size=(8, 8))(res)
    xa, ya = out["a_crop_bbox"][:2]
    np.testing.assert_array_equal(out["a"], a[ya:ya + 8, xa:xa + 8])
    np.testing.assert_array_equal(out["b"], b[ya:ya + 8, xa:xa + 8])


def test_crop_around_center_and_unknown():
    h = w = 64
    alpha = np.zeros((h, w), np.uint8)
    alpha[24:40, 24:40] = 128
    trimap = np.zeros((h, w), np.uint8)
    trimap[20:44, 20:44] = 128
    res = {"fg": _img(h, w), "bg": _img(h, w, seed=9), "alpha": alpha,
           "trimap": trimap, "rng": np.random.default_rng(0)}
    out = X.CropAroundCenter(32)(dict(res))
    assert out["fg"].shape == (32, 32, 3)
    assert out["alpha"].shape == (32, 32)

    res2 = {"fg": _img(h, w), "alpha": alpha.copy(),
            "rng": np.random.default_rng(1)}
    out2 = X.CropAroundUnknown(keys=["fg", "alpha"], crop_sizes=[32])(res2)
    assert out2["fg"].shape == (32, 32, 3)
    left, top, right, bottom = out2["crop_bbox"]
    # the crop contains unknown pixels
    assert (out2["alpha"] == 128).any()


def test_crop_around_fg_and_mod_crop():
    seg = np.zeros((40, 40), np.uint8)
    seg[10:20, 12:25] = 1
    res = {"seg": seg, "fg": _img(40, 40),
           "rng": np.random.default_rng(0)}
    out = X.CropAroundFg(keys=["seg", "fg"])(res)
    assert out["seg"].sum() == seg.sum()  # whole fg retained

    res2 = {"gt": _img(37, 41), "scale": 4}
    out2 = X.ModCrop()(res2)
    assert out2["gt"].shape == (36, 40, 3)


def test_crop_like():
    res = {"a": _img(20, 30), "ref": _img(10, 40)}
    out = X.CropLike("a", "ref")(res)
    assert out["a"].shape == (10, 40, 3)
    assert (out["a"][:, 30:] == 0).all()  # zero-padded new area


def test_resize_modes():
    res = {"img": _img(30, 40)}
    out = X.Resize(keys=["img"], scale=(15, 20))(dict(res))
    assert out["img"].shape == (15, 20, 3)
    out2 = X.Resize(keys=["img"], scale=0.5)(dict(res))
    assert out2["img"].shape == (15, 20, 3)
    out3 = X.Resize(keys=["img"], size_factor=16)(dict(res))
    assert out3["img"].shape == (16, 32, 3)
    out4 = X.Resize(keys=["img"], scale=(-1, 20), keep_ratio=True)(dict(res))
    # (-1, 20) means: rescale so the SHORT edge is 20 (mmcv imrescale)
    assert min(out4["img"].shape[:2]) == 20


def test_random_affine_matches_reference_matrix():
    """The inverse-affine matrix math is the parity-critical part; compare
    against the reference implementation verbatim."""
    import importlib.util
    import sys

    sys.modules.setdefault("mmcv", __import__("types").ModuleType("mmcv"))
    center = (16.5, 16.5)
    params = (30.0, (2.0, -3.0), (1.2, 0.8), 5.0, np.array([1, -1]))
    got = X.RandomAffine._get_inverse_affine_matrix(center, *params)

    import math as m

    def ref_matrix(center, angle, translate, scale, shear, flip):
        angle = m.radians(angle)
        shear = m.radians(shear)
        scale_x = 1.0 / scale[0] * flip[0]
        scale_y = 1.0 / scale[1] * flip[1]
        d = m.cos(angle + shear) * m.cos(angle) + m.sin(
            angle + shear) * m.sin(angle)
        matrix = [
            m.cos(angle) * scale_x,
            m.sin(angle + shear) * scale_x, 0, -m.sin(angle) * scale_y,
            m.cos(angle + shear) * scale_y, 0
        ]
        matrix = [v / d for v in matrix]
        matrix[2] += matrix[0] * (-center[0] - translate[0]) + matrix[1] * (
            -center[1] - translate[1])
        matrix[5] += matrix[3] * (-center[0] - translate[0]) + matrix[4] * (
            -center[1] - translate[1])
        matrix[2] += center[0]
        matrix[5] += center[1]
        return matrix

    np.testing.assert_allclose(got, ref_matrix(center, *params), rtol=1e-12)


def test_random_affine_runs():
    res = {"fg": _img(32, 32), "alpha": _img(32, 32, 1)[..., 0],
           "rng": np.random.default_rng(0)}
    out = X.RandomAffine(keys=["fg", "alpha"], degrees=30,
                         translate=(0.1, 0.1), flip_ratio=0.5)(res)
    assert out["fg"].shape == (32, 32, 3)


def test_random_jitter():
    alpha = np.zeros((16, 16), np.uint8)
    alpha[4:12, 4:12] = 255
    res = {"fg": _img(16, 16), "alpha": alpha,
           "rng": np.random.default_rng(0)}
    out = X.RandomJitter(hue_range=40)(res)
    assert out["fg"].dtype == np.float32
    assert out["fg"].shape == (16, 16, 3)


def test_binarize_and_mask_dilation():
    res = {"m": np.asarray([[0.2, 0.8], [0.4, 0.9]], np.float32)}
    out = X.BinarizeImage(keys=["m"], binary_thr=0.5)(res)
    np.testing.assert_array_equal(out["m"], [[0, 1], [0, 1]])

    mask = np.zeros((20, 20), np.float32)
    mask[10, 10] = 1
    res2 = {"m": mask, "rng": np.random.default_rng(0)}
    out2 = X.RandomMaskDilation(keys=["m"], kernel_min=3, kernel_max=5)(res2)
    assert out2["m"].sum() > 1
    assert out2["m_dilate_kernel_size"] in (3, 4, 5)


@pytest.mark.parametrize("padding,expect", [
    ("replicate", [0, 0, 0, 1, 2]),
    ("reflection", [2, 1, 0, 1, 2]),
    ("reflection_circle", [4, 3, 0, 1, 2]),
    ("circle", [3, 4, 0, 1, 2]),
])
def test_generate_frame_indices_with_padding(padding, expect):
    """Exact index tables from the reference docstring
    (augmentation.py:718)."""
    res = {"key": "000/00000000", "max_frame_num": 100,
           "num_input_frames": 5, "lq_path": "/lq", "gt_path": "/gt"}
    out = X.GenerateFrameIndiceswithPadding(padding)(dict(res))
    got = [int(os.path.basename(p).split(".")[0]) for p in out["lq_path"]]
    assert got == expect
    assert out["gt_path"] == [os.path.join("/gt", "000", "00000000.png")]


def test_load_image_and_paired(tmp_path):
    img = (np.arange(16 * 32 * 3) % 255).reshape(16, 32, 3).astype(np.uint8)
    path = str(tmp_path / "pair.png")
    cv2.imwrite(path, img)
    res = {"pair_path": path}
    out = X.LoadPairedImageFromFile(key="pair")(res)
    assert out["img_a"].shape == (16, 16, 3)
    assert out["img_b"].shape == (16, 16, 3)
    np.testing.assert_array_equal(
        np.concatenate([out["img_a"], out["img_b"]], axis=1), out["pair"])


def test_random_load_resize_bg(tmp_path):
    cv2.imwrite(str(tmp_path / "bg1.png"),
                np.full((8, 8, 3), 77, np.uint8))
    res = {"fg": _img(16, 24), "rng": np.random.default_rng(0)}
    out = X.RandomLoadResizeBg(str(tmp_path))(res)
    assert out["bg"].shape == (16, 24, 3)


def test_load_mask_modes(tmp_path):
    rng = np.random.default_rng(0)
    out = X.LoadMask("bbox", dict(img_shape=(64, 64),
                                  max_bbox_shape=(16, 16),
                                  max_bbox_delta=(4, 4),
                                  min_margin=(4, 4)))({"rng": rng})
    assert out["mask"].shape == (64, 64, 1)
    top, left, h, w = out["mask_bbox"]
    assert out["mask"][top, left] == 1

    out2 = X.LoadMask("ff", dict(img_shape=(32, 32)))({"rng": rng})
    assert out2["mask"].max() <= 1

    mpath = str(tmp_path / "m.png")
    cv2.imwrite(mpath, (np.eye(16) * 255).astype(np.uint8))
    out3 = X.LoadMask("file")({"mask_path": mpath})
    assert out3["mask"].sum() == 16


def test_spatial_discount_mask_oracle():
    """Exact reference formula (loading.py:381)."""
    t = X.GetSpatialDiscountMask(gamma=0.9, beta=2.0)
    hole = t.spatial_discount_mask(4, 3)
    w, h = np.meshgrid(np.arange(4), np.arange(3))
    grid = np.stack([h, w], axis=2)
    expect = (0.9 ** (np.minimum(grid, [2, 3] - grid) * 2.0)).max(
        axis=2, keepdims=True)
    np.testing.assert_allclose(hole, expect)

    mask = np.zeros((10, 10, 1), np.float32)
    res = {"mask": mask, "mask_bbox": (2, 3, 3, 4)}
    out = t(res)
    assert out["discount_mask"][2:5, 3:7].min() > 0
    assert out["discount_mask"].sum() == pytest.approx(hole.sum())


def test_formatting_shims():
    res = {"img": (np.ones((4, 6, 3)) * 7).astype(np.uint8)}
    out = X.ImageToTensor(keys=["img"])(res)
    assert out["img"].shape == (3, 4, 6) and out["img"].dtype == np.float32

    res2 = {"frames": [np.ones((4, 6, 3), np.uint8)] * 2}
    out2 = X.FramesToTensor(keys=["frames"])(res2)
    assert out2["frames"].shape == (2, 3, 4, 6)

    res3 = {"gt_img": np.ones((4, 4, 3), np.float32),
            "mask": np.zeros((4, 4, 1), np.float32)}
    res3["mask"][1, 1] = 1
    out3 = X.GetMaskedImage()(res3)
    assert out3["masked_img"][1, 1, 0] == 0
    assert out3["masked_img"][0, 0, 0] == 1

    trimap = np.zeros((4, 4), np.uint8)
    trimap[1] = 128
    trimap[2] = 255
    out4 = X.FormatTrimap()({"trimap": trimap.copy()})
    assert set(np.unique(out4["trimap"])) == {0.0, 1.0, 2.0}
    assert out4["trimap"].shape == (1, 4, 4)
    out5 = X.FormatTrimap(to_onehot=True)({"trimap": trimap.copy()})
    assert out5["trimap"].shape == (3, 4, 4)
    np.testing.assert_array_equal(out5["trimap"].sum(0), np.ones((4, 4)))
