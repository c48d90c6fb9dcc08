"""Metrics vs reference oracle + sliding/tiled inference invariants."""

import importlib.util

import numpy as np
import pytest

from vmg_tpu.eval.metrics import (
    calculate_psnr,
    structural_similarity,
    rgb2ycbcr_matlab,
    psnr_float01,
)
from vmg_tpu.eval.inference import SlidingEvaluator


def _ref_metrics():
    spec = importlib.util.spec_from_file_location(
        "ref_metrics", "/root/reference/utils/metrics.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_psnr_ssim_match_reference(rng):
    ref = _ref_metrics()
    a = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-12, 12, a.shape), 0, 255).astype(np.uint8)
    assert abs(calculate_psnr(a, b) - ref.calculate_psnr(a, b)) < 1e-9
    assert abs(calculate_psnr(a, b, border=4) - ref.calculate_psnr(a, b, border=4)) < 1e-9
    assert abs(structural_similarity(a, b) - ref.structural_similarity(a, b)) < 1e-9


def test_ycbcr_matches_matlab_convention():
    # white -> Y=235, black -> Y=16
    white = np.full((2, 2, 3), 255, np.uint8)
    black = np.zeros((2, 2, 3), np.uint8)
    assert abs(rgb2ycbcr_matlab(white)[..., 0].mean() - 235.0) < 1e-6
    assert abs(rgb2ycbcr_matlab(black)[..., 0].mean() - 16.0) < 1e-6


def _pointwise_forward(scale=4):
    """A spatially-local fake SR model: nearest x4 + channel mix."""

    def fn(clip):
        x = np.asarray(clip, np.float32)
        up = x.repeat(scale, axis=2).repeat(scale, axis=3)
        return up * 0.9 + 0.01
    return fn


def test_tiled_inference_equals_full_frame_for_local_model(rng):
    ev = SlidingEvaluator(
        _pointwise_forward(), scale=4, test_num_frames=4, overlapped_mode="mid",
        spatial_wins=(32, 32), overlapped_spatial_length=8, dataset_name="X",
    )
    x = rng.random((1, 4, 48, 56, 3)).astype(np.float32)
    tiled = ev.test_image(x)
    full = _pointwise_forward()(x)
    np.testing.assert_allclose(tiled, full, atol=1e-6)


def test_sliding_clips_equals_full_for_frame_local_model(rng):
    ev = SlidingEvaluator(
        _pointwise_forward(), scale=4, test_num_frames=4, overlapped_mode="mid",
        spatial_wins=None, overlapped_spatial_length=None, dataset_name="X",
    )
    x = rng.random((1, 10, 16, 16, 3)).astype(np.float32)
    out = ev.test_clips(x)
    full = _pointwise_forward()(x)
    np.testing.assert_allclose(out, full, atol=1e-6)


def test_oracle_picks_best_clip(rng):
    """A forward that corrupts frames whose clip doesn't start at their
    'home' position; the oracle must recover the clean version per frame."""
    scale = 1
    T, tn = 8, 4
    hr = rng.random((1, T, 8, 8, 3)).astype(np.float32)
    calls = []

    def fn(clip):
        # identify which window by matching content; corrupt second half
        out = np.array(clip, np.float32)
        calls.append(out.shape)
        out[:, tn // 2:] = 0.5  # second half of every window is bad
        return out

    ev = SlidingEvaluator(fn, scale=1, test_num_frames=tn, overlapped_mode="mid",
                          spatial_wins=None, overlapped_spatial_length=None,
                          dataset_name="REDS")
    # feed LR == HR so "good" frames are perfect
    out = ev.test_clips_max(hr, hr)
    # frames covered by the first half of some window must be exact
    starts = ev.t_idx_list
    good = set()
    for s in starts:
        good.update(range(s, s + tn // 2))
    for f in sorted(good):
        np.testing.assert_allclose(out[0, f], hr[0, f], atol=1e-6, err_msg=f"frame {f}")


def test_evaluate_uint8_roundtrip(rng):
    ev = SlidingEvaluator(_pointwise_forward(), scale=4, test_num_frames=4,
                          overlapped_mode=2, spatial_wins=None,
                          overlapped_spatial_length=None, dataset_name="Other")
    x = (rng.random((6, 16, 16, 3)) * 255).astype(np.uint8)
    out = ev.evaluate(x)
    assert out.dtype == np.uint8
    assert out.shape == (6, 64, 64, 3)


def test_tta_matches_reference_augment(rng):
    """TTA flip/transpose == reference Tester.augment/augment_inverse
    (tools/Tester.py:387-445), and the data_enhance path is exact for an
    augmentation-equivariant model (here: bicubic-like zoom)."""
    import numpy as np
    from vmg_tpu.eval.inference import SlidingEvaluator

    clip = rng.random((1, 3, 8, 10, 3)).astype(np.float32)

    def ref_augment(c, hflip, vflip, rot90):
        # reference semantics on (B, D, C, H, W); ours is channels-last
        t = c.transpose(0, 1, 4, 2, 3)
        if hflip:
            t = t[..., ::-1]
        if vflip:
            t = t[..., ::-1, :]
        if rot90:
            t = t.transpose(0, 1, 2, 4, 3)
        return np.ascontiguousarray(t).transpose(0, 1, 3, 4, 2)

    for flags in [(True, True, False), (True, False, False),
                  (False, True, True), (True, True, True)]:
        ev = SlidingEvaluator(lambda x: x, scale=1, test_num_frames=3,
                              overlapped_mode=0, spatial_wins=None,
                              overlapped_spatial_length=None,
                              data_enhance=True, tta_hflip=flags[0],
                              tta_vflip=flags[1], tta_rot=flags[2])
        np.testing.assert_array_equal(ev.augment(clip),
                                      ref_augment(clip, *flags))
        # augment_inverse is the same transform as augment (matching the
        # reference, whose augment/augment_inverse are identical code,
        # Tester.py:387-445); that inverts correctly only when rot is off
        # or both flips are on -- single-flip + transpose does NOT
        # self-invert, a latent reference quirk reproduced faithfully
        if not flags[2] or (flags[0] and flags[1]):
            np.testing.assert_array_equal(ev.augment(ev.augment(clip)), clip)

    # data_enhance with an equivariant forward (2x nearest zoom): the
    # augment -> forward -> inverse-augment pipeline returns the plain
    # forward result exactly
    def zoom2(x):
        return np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)

    sq = (rng.random((3, 8, 8, 3)) * 255).astype(np.uint8)  # rot: H == W
    ev = SlidingEvaluator(zoom2, scale=2, test_num_frames=3,
                          overlapped_mode=0, spatial_wins=None,
                          overlapped_spatial_length=None, data_enhance=True,
                          dataset_name="val", tta_hflip=True,
                          tta_vflip=True, tta_rot=True)
    got = ev.evaluate(sq)
    want = zoom2(sq[None].astype(np.float32))[0].astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_device_tiled_matches_host_tiling(rng):
    """The jitted on-device tile loop reproduces the host test_image path
    (same trims, same accumulation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.eval.inference import SlidingEvaluator
    from vmg_tpu.eval.device_tiled import make_device_tiled_forward

    scale, wins, ov = 2, (8, 8), 4
    H, W = 14, 18

    def apply_fn(params, patch):  # fake model: nearest 2x zoom + bias
        z = jnp.repeat(jnp.repeat(patch, scale, axis=2), scale, axis=3)
        return z + params["b"]

    params = {"b": jnp.asarray(0.25)}

    def host_forward(clip_np):
        return np.asarray(apply_fn(params, jnp.asarray(clip_np)))

    ev = SlidingEvaluator(host_forward, scale=scale, test_num_frames=2,
                          overlapped_mode=0, spatial_wins=wins,
                          overlapped_spatial_length=ov, dataset_name="val")
    x = rng.random((1, 2, H, W, 3)).astype(np.float32)
    want = ev.test_image(x)

    dev = make_device_tiled_forward(apply_fn, scale, wins, ov, (H, W))
    got = np.asarray(dev(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # and it plugs into the evaluator
    ev2 = SlidingEvaluator(host_forward, scale=scale, test_num_frames=2,
                           overlapped_mode=0, spatial_wins=wins,
                           overlapped_spatial_length=ov, dataset_name="val",
                           device_tiled_fn=lambda c: dev(params, jnp.asarray(c)))
    np.testing.assert_allclose(ev2._run_clip(x), want, atol=1e-6)
