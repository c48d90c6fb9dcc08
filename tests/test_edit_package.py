"""Registry, pipeline, loss-zoo, masks, tensor2img tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax.numpy as jnp

from vmg_tpu.edit import (
    Registry, PIPELINES, LOSSES, build_from_cfg, Compose,
    tensor2img, bbox_mask, irregular_mask, brush_stroke_mask,
)


def test_registry_basics():
    r = Registry("toy")

    @r.register_module()
    class Foo:
        def __init__(self, a=1):
            self.a = a

    assert "Foo" in r
    obj = build_from_cfg({"type": "Foo", "a": 5}, r)
    assert obj.a == 5
    with pytest.raises(KeyError):
        r.get("Bar")
    with pytest.raises(KeyError):
        r.register_module(Foo)  # duplicate


def _toy_results(rng, t=4, h=32, w=40, scale=4):
    lq = [rng.random((h, w, 3)).astype(np.float32) * 255 for _ in range(t)]
    gt = [rng.random((h * scale, w * scale, 3)).astype(np.float32) * 255
          for _ in range(t)]
    return {"lq": lq, "gt": gt, "scale": scale, "rng": rng}


def test_pipeline_compose_video_sr(rng):
    pipeline = Compose([
        {"type": "RescaleToZeroOne"},
        {"type": "PairedRandomCrop", "gt_patch_size": 64},
        {"type": "Flip", "flip_ratio": 1.0},
        {"type": "TemporalReverse", "reverse_ratio": 1.0},
        {"type": "FramesToArray"},
        {"type": "Collect", "keys": ("lq", "gt")},
    ])
    out = pipeline(_toy_results(rng))
    assert out["lq"].shape == (4, 16, 16, 3)
    assert out["gt"].shape == (4, 64, 64, 3)
    assert out["lq"].max() <= 1.0


def test_paired_crop_is_aligned(rng):
    res = _toy_results(rng)
    # make gt an exact upsample of lq so alignment is checkable
    res["gt"] = [np.repeat(np.repeat(v, 4, 0), 4, 1) for v in res["lq"]]
    out = Compose([{"type": "PairedRandomCrop", "gt_patch_size": 32}])(res)
    np.testing.assert_allclose(out["gt"][0][::4, ::4], out["lq"][0], atol=1e-6)


def test_mirror_and_pad(rng):
    res = _toy_results(rng, t=3)
    orig = [v.copy() for v in res["lq"]]
    out = Compose([
        {"type": "MirrorSequence", "keys": ("lq",)},
        {"type": "Pad", "keys": ("lq",), "ds_factor": 32},
    ])(res)
    assert len(out["lq"]) == 6
    assert out["lq"][0].shape[0] % 32 == 0
    np.testing.assert_array_equal(out["lq"][3][:32, :40], orig[2])


def test_losses_match_torch(rng):
    a = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    b = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)

    l1 = build_from_cfg({"type": "L1Loss"}, LOSSES)
    assert abs(float(l1(ja, jb)) - float(TF.l1_loss(ta, tb))) < 1e-6
    mse = build_from_cfg({"type": "MSELoss"}, LOSSES)
    assert abs(float(mse(ja, jb)) - float(TF.mse_loss(ta, tb))) < 1e-6
    cb = build_from_cfg({"type": "CharbonnierLoss", "eps": 1e-12}, LOSSES)
    want = torch.mean(torch.sqrt((ta - tb) ** 2 + 1e-12))
    assert abs(float(cb(ja, jb)) - float(want)) < 1e-6

    # masked weighted mean
    w = (rng.random((2, 8, 8, 3)) > 0.5).astype(np.float32)
    got = float(l1(ja, jb, jnp.asarray(w)))
    want = float((np.abs(a - b) * w).sum() / w.sum())
    assert abs(got - want) < 1e-5


def test_gan_losses(rng):
    logits = jnp.asarray(rng.standard_normal((4, 1)).astype(np.float32))
    for t in ("vanilla", "lsgan", "wgan", "hinge"):
        gl = build_from_cfg({"type": "GANLoss", "gan_type": t}, LOSSES)
        for real in (True, False):
            for disc in (True, False):
                v = float(gl(logits, real, disc))
                assert np.isfinite(v)
    # vanilla == BCE-with-logits
    gl = build_from_cfg({"type": "GANLoss", "gan_type": "vanilla"}, LOSSES)
    got = float(gl(logits, True, True))
    want = float(TF.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(logits)), torch.ones(4, 1)))
    assert abs(got - want) < 1e-5


def test_masks(rng):
    g = np.random.default_rng(0)
    m = bbox_mask((256, 256), rng=g)
    assert m.shape == (256, 256, 1) and set(np.unique(m)) <= {0.0, 1.0}
    m2 = irregular_mask((128, 128), rng=g)
    assert m2.sum() >= 0.15 * 128 * 128
    m3 = brush_stroke_mask((128, 128), rng=g)
    assert m3.shape == (128, 128, 1)


def test_tensor2img():
    x = np.zeros((2, 4, 4, 3), np.float32)
    x[..., 0] = 1.0  # pure red
    img = tensor2img(x)
    assert img.dtype == np.uint8
    assert img.shape == (4, 4, 3)
    assert img[0, 0, 2] == 255 and img[0, 0, 0] == 0  # BGR order
