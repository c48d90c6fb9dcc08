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


def _vgg16_torch_features(x, sd, need):
    """Plain-torch replica of torchvision vgg16.features for the golden
    comparison (torchvision itself is not installed here)."""
    import torch
    import torch.nn.functional as F

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    feats = {}
    i = 0
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for c in plan:
        if i > max(need):
            break
        if c == "M":
            t = F.max_pool2d(t, 2, 2)
            if i in need:
                feats[i] = t
            i += 1
            continue
        w = torch.from_numpy(sd[f"features.{i}.weight"])
        b = torch.from_numpy(sd[f"features.{i}.bias"])
        t = F.conv2d(t, w, b, padding=1)
        if i in need:
            feats[i] = t
        i += 1
        t = torch.relu(t)
        if i in need:
            feats[i] = t
        i += 1
    return {k: v.numpy().transpose(0, 2, 3, 1) for k, v in feats.items()}


def test_perceptual_loss_vgg_features_golden(rng):
    """PerceptualLoss VGG extractor matches a torch replica of
    torchvision vgg16.features with the same (random) weights, and the
    loss contract (percep, style) holds."""
    import numpy as np
    from vmg_tpu.edit.losses import PerceptualLoss

    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
    sd, i, cin = {}, 0, 3
    for c in plan:
        if c == "M":
            i += 1
            continue
        sd[f"features.{i}.weight"] = (
            rng.standard_normal((c, cin, 3, 3)).astype(np.float32) * 0.05)
        sd[f"features.{i}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.05
        cin = c
        i += 2

    need = {3, 8, 15}  # relu1_2, relu2_2, relu3_3 torchvision indices
    loss = PerceptualLoss(
        layer_weights={k: 1.0 for k in need}, vgg_params=sd,
        vgg_type="vgg16", use_input_norm=False, norm_img=False,
        perceptual_weight=1.0, style_weight=0.5, criterion="l1",
    )
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    mine = loss._features(x)
    want = _vgg16_torch_features(x, sd, need)
    for k in need:
        np.testing.assert_allclose(np.asarray(mine[k]), want[k],
                                   atol=2e-4, rtol=1e-3)

    gt = rng.random((1, 32, 32, 3)).astype(np.float32)
    percep, style = loss(x, gt)
    assert percep is not None and style is not None
    assert float(percep) > 0 and float(style) >= 0
    p_self, s_self = loss(x, x)
    assert abs(float(p_self)) < 1e-6 and abs(float(s_self)) < 1e-7

    import pytest
    with pytest.raises(ValueError):
        PerceptualLoss(layer_weights={"3": 1.0}, vgg_params=None)


def test_random_down_sampling(rng):
    from vmg_tpu.edit.pipelines import RandomDownSampling

    gt = rng.random((48, 52, 3)).astype(np.float32)
    # whole-image mode
    out = RandomDownSampling(2.0, 3.0)({"gt": gt.copy(), "rng": rng})
    assert 2.0 <= out["scale"] < 3.0
    h_lr, w_lr = out["lq"].shape[:2]
    assert out["gt"].shape[0] == round(h_lr * out["scale"])
    # patch mode: lq is patch_size square, gt is round(patch*scale) square
    out = RandomDownSampling(2.0, 3.0, patch_size=12)({"gt": gt.copy(),
                                                       "rng": rng})
    assert out["lq"].shape[:2] == (12, 12)
    assert out["gt"].shape[0] == out["gt"].shape[1] == round(12 * out["scale"])


def test_generate_heatmap_and_coordinate_cell(rng):
    from vmg_tpu.edit.pipelines import (
        GenerateHeatmap, GenerateCoordinateAndCell, make_coord,
    )

    res = {"landmark": [(8.0, 4.0), (2.0, 2.0)]}
    out = GenerateHeatmap("landmark", ori_size=32, target_size=16,
                          sigma=1.0)(res)
    hm = out["heatmap"]
    assert hm.shape == (16, 16, 2)
    # peak at the scaled keypoint (8,4)*0.5 = (4,2): heatmap[y=2, x=4]
    assert hm[2, 4, 0] == hm[..., 0].max() == 1.0

    gt = rng.random((8, 6, 3)).astype(np.float32)
    out = GenerateCoordinateAndCell(sample_quantity=10)({"gt": gt.copy(),
                                                         "rng": rng})
    assert out["coord"].shape == (10, 2) and out["cell"].shape == (10, 2)
    assert out["gt"].shape == (10, 3)
    np.testing.assert_allclose(out["cell"][0], [2 / 8, 2 / 6], atol=1e-6)
    # coord grid bounds: pixel centers strictly inside [-1, 1]
    full = make_coord((8, 6))
    assert full.shape == (48, 2)
    assert full.min() > -1.0 and full.max() < 1.0
