"""GOLDEN eval-protocol parity: the reference Tester's tiled / sliding /
oracle inference (tools/Tester.py:108-213) vs SlidingEvaluator, driven by
the same deterministic fake model in both frameworks."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-torch golden runs
import torch

sys.path.insert(0, os.path.dirname(__file__))
from ref_stubs import install_stubs  # noqa: E402

from vmg_tpu.eval.inference import SlidingEvaluator  # noqa: E402

SCALE = 4


def _fake_np(clip):
    """Deterministic fake SR: nearest x4 + a global-mean term so tiles
    differ from the full frame (exposes the blending paths).
    clip: (B, T, H, W, C) channels-last float32."""
    x = np.asarray(clip, np.float32)
    up = x.repeat(SCALE, axis=2).repeat(SCALE, axis=3)
    gmean = x.mean(axis=(2, 3), keepdims=True)
    return 0.9 * up + 0.1 * gmean.repeat(up.shape[2], 2).repeat(up.shape[3], 3)


class _FakeTorchModel(torch.nn.Module):
    def forward(self, x):  # x: (B, T, C, H, W)
        arr = x.permute(0, 1, 3, 4, 2).numpy()
        out = _fake_np(arr)
        return torch.from_numpy(np.ascontiguousarray(out.transpose(0, 1, 4, 2, 3)))


def _make_ref_tester(test_num_frames, overlapped_mode, wins, ov_spatial,
                     dataset_name="REDS"):
    install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/tools")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_tester", "/root/reference/tools/Tester.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    t = object.__new__(mod.Tester)
    t.scale = SCALE
    t.test_num_frames = test_num_frames
    if overlapped_mode == "mid":
        t.overlapped_num_frames = test_num_frames // 2
    elif overlapped_mode == "small":
        t.overlapped_num_frames = 2
    else:
        t.overlapped_num_frames = int(overlapped_mode)
    t.test_spatial = wins
    t.overlapped_spatial_length = ov_spatial
    t.dataset_name = dataset_name
    t.data_enhance = False
    t.model = _FakeTorchModel()
    return t


def _mine(test_num_frames, overlapped_mode, wins, ov_spatial,
          dataset_name="REDS"):
    return SlidingEvaluator(
        _fake_np, scale=SCALE, test_num_frames=test_num_frames,
        overlapped_mode=overlapped_mode, spatial_wins=wins,
        overlapped_spatial_length=ov_spatial, dataset_name=dataset_name,
    )


def _torch_in(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 1, 4, 2, 3)))


def _torch_out(t):
    return t.numpy().transpose(0, 1, 3, 4, 2)


def test_tiled_inference_matches_reference(rng):
    x = rng.random((1, 3, 40, 56, 3)).astype(np.float32)
    ref = _make_ref_tester(3, "mid", [32, 32], 8)
    with torch.no_grad():
        want = _torch_out(ref.test_image(_torch_in(x)))
    got = _mine(3, "mid", (32, 32), 8).test_image(x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sliding_clips_match_reference(rng):
    x = rng.random((1, 10, 16, 16, 3)).astype(np.float32)
    ref = _make_ref_tester(4, "mid", None, None, dataset_name="Vid4")
    with torch.no_grad():
        want = _torch_out(ref.test_clips(_torch_in(x)))
    got = _mine(4, "mid", None, None, dataset_name="Vid4").test_clips(x)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_oracle_clip_selection_matches_reference(rng):
    x = rng.random((1, 8, 16, 16, 3)).astype(np.float32)
    hr = rng.random((1, 8, 64, 64, 3)).astype(np.float32)
    ref = _make_ref_tester(4, "mid", None, None, dataset_name="REDS")
    with torch.no_grad():
        want = ref.test_clips_max(_torch_in(x), _torch_in(hr))
    want = want.numpy()[None] if want.ndim == 4 else want.numpy()
    want = want.transpose(0, 1, 3, 4, 2)
    got = _mine(4, "mid", None, None).test_clips_max(x, hr)
    np.testing.assert_allclose(got, want, atol=1e-5)
