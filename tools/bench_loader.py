#!/usr/bin/env python
"""Host-loader throughput microbenchmark: batched C++ assemble_batch vs
per-clip assemble_clip vs pure numpy, on a synthetic packed REDS shard at
the paper recipe shape (T=16, LR crop 64 / HR crop 256, batch 4).

Prints one JSON line with clips/s for each path.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def main():
    from vmg_tpu.configs.config import DatasetConfig
    from vmg_tpu.data import PackedWriter, REDSDataset
    from vmg_tpu.data.native import get_lib

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="vmg_loader_bench_")
    hr_dir, lr_dir = os.path.join(tmp, "hr"), os.path.join(tmp, "lr")
    H, W = 180, 320  # REDS LR stored frames
    wh = PackedWriter(hr_dir, (H * 4, W * 4, 3))
    wl = PackedWriter(lr_dir, (H, W, 3))
    n_frames = 24
    for f in range(n_frames):
        hr = rng.integers(0, 256, (H * 4, W * 4, 3), np.uint8)
        wh.add(f"000_{f}", hr, clip_key="000")
        wl.add(f"000_{f}", hr[::4, ::4].copy(), clip_key="000")
    wh.close()
    wl.close()

    cfg = DatasetConfig(
        name="REDS", dataroot_HR=hr_dir, dataroot_LR=lr_dir, num_frames=16,
        crop_size=256, image_shape=(3, H * 4, W * 4), total_num_frames=n_frames,
        pre_seed=0, batch_size=4,
    )
    ds = REDSDataset(cfg, scale=4)
    assert get_lib() is not None, "native lib unavailable"
    idxs = [0] * 4  # one clip key; 4 random crops via per-index rng

    def timeit(fn, reps=8):
        fn()  # warm (page-in the mmap)
        t0 = time.time()
        for _ in range(reps):
            fn()
        return 4 * reps / (time.time() - t0)  # clips/s

    batched = timeit(lambda: ds.get_batch(idxs))
    per_clip = timeit(lambda: [ds[i] for i in idxs])
    ds.use_native = False
    numpy_path = timeit(lambda: [ds[i] for i in idxs])

    print(json.dumps({
        "metric": "host loader throughput (T=16, crop 256, batch 4)",
        "unit": "clips/s",
        "batched_cpp": round(batched, 2),
        "per_clip_cpp": round(per_clip, 2),
        "numpy": round(numpy_path, 2),
        "cpu_count": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
