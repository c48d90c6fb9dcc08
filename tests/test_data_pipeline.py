"""Data pipeline: packed backend roundtrip, clip sampling semantics,
sampler sharding, prefetch loader."""

import numpy as np
import pytest

from vmg_tpu.configs.config import DatasetConfig
from vmg_tpu.data import PackedWriter, REDSDataset, IterSampler, PrefetchLoader
from vmg_tpu.data.storage import PackedBackend


@pytest.fixture
def packed_reds(tmp_path, rng):
    """Two 10-frame clips, HR 64x64 and LR 16x16."""
    hr_dir, lr_dir = str(tmp_path / "hr"), str(tmp_path / "lr")
    wh = PackedWriter(hr_dir, (64, 64, 3))
    wl = PackedWriter(lr_dir, (16, 16, 3))
    frames = {}
    for clip in ["000", "001"]:
        for f in range(10):
            hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            lr = hr[::4, ::4]
            frames[(clip, f)] = (hr, lr)
            wh.add(f"{clip}_{f}", hr, clip_key=clip)
            wl.add(f"{clip}_{f}", lr, clip_key=clip)
    wh.close()
    wl.close()
    cfg = DatasetConfig(
        name="REDS", dataroot_HR=hr_dir, dataroot_LR=lr_dir, cache_keys=None,
        num_frames=4, crop_size=32, image_shape=(3, 64, 64),
        total_num_frames=10, pre_seed=0, use_hflip=True, use_vflip=True,
        use_rot=True, random_reverse=True, batch_size=2, n_workers=2,
        dataset_expand_ratio=2,
    )
    return cfg, frames


def test_packed_backend_roundtrip(packed_reds):
    cfg, frames = packed_reds
    be = PackedBackend(cfg.dataroot_HR)
    img = be.read("000_3")
    want = frames[("000", 3)][0].astype(np.float32) / 255.0
    np.testing.assert_allclose(img, want)
    assert be.keys == ["000", "001"]


def test_clip_dataset_shapes_and_determinism(packed_reds):
    cfg, _ = packed_reds
    ds = REDSDataset(cfg, scale=4)
    assert len(ds) == 2
    s1 = ds[0]
    s2 = ds[0]
    assert s1["LRs"].shape == (4, 8, 8, 3)
    assert s1["HRs"].shape == (4, 32, 32, 3)
    np.testing.assert_array_equal(s1["LRs"], s2["LRs"])  # stateless rng
    ds.set_epoch(1)
    s3 = ds[0]
    assert not np.array_equal(s1["LRs"], s3["LRs"])  # epoch changes draws


def test_crop_is_paired(packed_reds):
    import dataclasses
    cfg, _ = packed_reds
    # flips/rot don't commute with the [::4] decimation used to fabricate
    # LR here, so check pairing with augmentation off
    cfg = dataclasses.replace(cfg, use_hflip=False, use_vflip=False,
                              use_rot=False)
    ds = REDSDataset(cfg, scale=4)
    s = ds[1]
    # LR crop upscaled by nearest should match the HR crop decimated
    lr, hr = s["LRs"], s["HRs"]
    np.testing.assert_allclose(lr, hr[:, ::4, ::4], atol=1e-6)


def test_iter_sampler_shards_cover_and_disjoint():
    n = 10
    s0 = IterSampler(n, num_replicas=2, rank=0, ratio=2, seed=7)
    s1 = IterSampler(n, num_replicas=2, rank=1, ratio=2, seed=7)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = list(s0), list(s1)
    assert len(i0) == len(i1) == 10
    # same epoch -> same underlying permutation, strided disjoint positions
    s0b = IterSampler(n, 2, 0, 2, 7)
    s0b.set_epoch(3)
    assert list(s0b) == i0
    # all indices are valid
    assert set(i0 + i1) <= set(range(n))


def test_prefetch_loader_batches(packed_reds):
    cfg, _ = packed_reds
    ds = REDSDataset(cfg, scale=4)
    sampler = IterSampler(len(ds), 1, 0, ratio=4, seed=0)
    loader = PrefetchLoader(ds, sampler, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == len(loader) == 4
    for b in batches:
        assert b["LRs"].shape == (2, 4, 8, 8, 3)
        assert b["HRs"].shape == (2, 4, 32, 32, 3)
        assert b["LRs"].dtype == np.float32


def test_loader_propagates_worker_errors():
    """A worker exception must surface in the consumer, not hang the loop."""
    import pytest
    from vmg_tpu.data.loader import PrefetchLoader

    class Broken:
        def __getitem__(self, i):
            raise FileNotFoundError(f"missing {i}")

        def __len__(self):
            return 4

    loader = PrefetchLoader(Broken(), sampler=[0, 1], batch_size=2,
                            num_workers=1)
    with pytest.raises(FileNotFoundError):
        list(iter(loader))
