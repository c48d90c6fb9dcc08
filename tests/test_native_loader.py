"""Native C++ clip assembly == pure-numpy dataset path, bit for bit."""

import numpy as np
import pytest

from vmg_tpu.configs.config import DatasetConfig
from vmg_tpu.data import PackedWriter, REDSDataset
from vmg_tpu.data.native import get_lib, assemble_clip


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable")


@pytest.fixture
def packed(tmp_path, rng):
    hr_dir, lr_dir = str(tmp_path / "hr"), str(tmp_path / "lr")
    wh = PackedWriter(hr_dir, (64, 64, 3))
    wl = PackedWriter(lr_dir, (16, 16, 3))
    for clip in ["000", "001"]:
        for f in range(8):
            hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            wh.add(f"{clip}_{f}", hr, clip_key=clip)
            wl.add(f"{clip}_{f}", hr[::4, ::4].copy(), clip_key=clip)
    wh.close()
    wl.close()
    return DatasetConfig(
        name="REDS", dataroot_HR=hr_dir, dataroot_LR=lr_dir, num_frames=3,
        crop_size=32, image_shape=(3, 64, 64), total_num_frames=8,
        pre_seed=0, use_hflip=True, use_vflip=True, use_rot=True,
        random_reverse=True,
    )


def test_native_matches_numpy_path(packed):
    ds_nat = REDSDataset(packed, scale=4)
    ds_np = REDSDataset(packed, scale=4)
    ds_np.use_native = False
    assert ds_nat._try_native is not None
    for epoch in range(2):
        ds_nat.set_epoch(epoch)
        ds_np.set_epoch(epoch)
        for i in range(2):
            a = ds_nat[i]
            b = ds_np[i]
            np.testing.assert_array_equal(a["LRs"], b["LRs"])
            np.testing.assert_array_equal(a["HRs"], b["HRs"])
            assert a["LRs"].dtype == np.float32


def test_get_batch_matches_per_clip(packed):
    """assemble_batch (one fused call per shard) == stacked per-clip
    samples, bit for bit, including mirror extension."""
    import dataclasses

    for mirrors in (False, True):
        cfg = dataclasses.replace(packed, use_mirrors=mirrors)
        ds = REDSDataset(cfg, scale=4)
        ds.set_epoch(1)
        got = ds.get_batch([0, 1, 0])
        assert got is not None
        singles = [ds[i] for i in (0, 1, 0)]
        np.testing.assert_array_equal(
            got["LRs"], np.stack([s["LRs"] for s in singles], 0))
        np.testing.assert_array_equal(
            got["HRs"], np.stack([s["HRs"] for s in singles], 0))
        assert got["keys"] == [s["key"] for s in singles]


def test_prefetch_loader_uses_batched_path(packed):
    from vmg_tpu.data.loader import PrefetchLoader

    ds = REDSDataset(packed, scale=4)
    calls = []
    orig = ds.get_batch

    def spy(idxs):
        calls.append(list(idxs))
        return orig(idxs)

    ds.get_batch = spy
    loader = PrefetchLoader(ds, sampler=[0, 1], batch_size=2, num_workers=1)
    batches = list(iter(loader))
    assert len(batches) == 1 and calls == [[0, 1]]
    assert batches[0]["LRs"].shape == (2, 3, 8, 8, 3)


def test_assemble_clip_oob_raises(packed, rng):
    frames = (rng.random((2, 8, 8, 3)) * 255).astype(np.uint8)
    mm = np.ascontiguousarray(frames.reshape(-1))
    with pytest.raises(ValueError):
        assemble_clip(mm, (8, 8, 3), [0], 5, 5, 8, 8, False, False, False)
