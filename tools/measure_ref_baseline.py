#!/usr/bin/env python
"""Measure the REFERENCE PyTorch VMG's throughput on this host's CPU,
same serving protocol as bench.py (full 7-stage model, 180x320 LR frames,
T=16, fp32 full-frame inference).

The reference repo commits no benchmark numbers and no GPU exists in this
image, so this measured torch-CPU number is the recorded comparison point
for bench.py's ``vs_baseline`` (documented in BASELINE.md).  The protocol
favors the reference where they differ: full-frame inference here costs
~1.7x LESS compute than the reference's own 128x128 tile loop
(Tester.py:108-143), and model-only time excludes its PNG/metric overhead.

Writes tools/ref_baseline.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--size", nargs=2, type=int, default=[180, 320])
    p.add_argument("--reps", type=int, default=1)
    args = p.parse_args()

    import numpy as np
    import torch
    from ref_stubs import import_reference_models

    ref_vmg = import_reference_models()
    torch.manual_seed(0)
    # full 7-stage architecture (reference configs/VMG-eval-REDS4.yml
    # network section, canonical keys per SURVEY.md §5)
    model = ref_vmg.VMG(
        embed_dim=[112, 224, 224, 448, 224, 224, 112],
        depths=[4, 4, 2, 2, 2, 4, 4],
        num_heads=[4, 8, 8, 16, 8, 8, 4],
        num_frames=args.frames,
        window_sizes=[(2, 8, 8), (4, 8, 8), (6, 8, 8), (8, 8, 8),
                      (6, 8, 8), (4, 8, 8), (2, 8, 8)],
        mlp_ratio=6, n_groups=4,
        mdsc=True, if_concat=False, spynet_pretrained="stub",
        image_size=[64, 64], is_train=False,
        traj_win=[16, None, None, None],
        traj_keyframes_n=[3, None, None, None],
        traj_heads=[4, None, None, None],
        temporal_type=[False, None, None, None], temporal_empty=True,
        traj_res_n=[15, 0, 0, 0, 0, 0, 15],
        spatial_type=[False, False, False, False],
        flow_smooth=True, smooth_region_range=4, retention_decay=True,
        non_linear=True, gating=True, symm=True, symm_act="tanh",
        relu_scale=True, relu_scale_norm=False, ffn_type="ffn_cnn",
        mixer_type=["mlps"] * 4, mixer_n=[None] * 4, r_scaling=0.1,
        chunk_ratios=[1 / 8, 1 / 4, 3 / 16, 1 / 8],
        traj_mode="wins", twins=[2, 2], traj_scale=True, traj_refine=None,
        m_scaling=1.0, if_local_fuse=True, channel_mixer="rcab",
    )
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())

    T = args.frames
    H, W = args.size
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((1, T, 3, H, W)).astype(np.float32))

    with torch.no_grad():
        t0 = time.time()
        out = model(x)
        warm = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            out = model(x)
            times.append(time.time() - t0)
    dt = min(times)
    fps = T / dt

    rec = {
        "metric": "reference torch-CPU throughput (full VMG, "
                  f"{H}x{W} full-frame, T={T}, fp32)",
        "value": round(fps, 4),
        "unit": "frames/sec",
        "seconds_per_clip": round(dt, 2),
        "warmup_seconds": round(warm, 2),
        "params_m": round(n_params / 1e6, 3),
        "torch_version": torch.__version__,
        "torch_threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "out_shape": list(out.shape),
    }
    out_path = os.path.join(os.path.dirname(__file__), "ref_baseline.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
