"""Vimeo-90K prep orchestration end-to-end (reference datasets/sep_vimeo.py,
prepare_vimeo.py, create_ann.py): synthetic septuplet tree -> sep-list
subset -> packed shard -> VimeoDataset sample -> eval CLI run."""

import os
import subprocess
import sys
import types

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _prep_module():
    sys.path.insert(0, TOOLS)
    import prepare_data

    return prepare_data


@pytest.fixture
def septuplet_tree(tmp_path, rng):
    """sequences/a/b/im1..im7.png at HR 256x256 + LR 64x64 side."""
    import cv2

    seq = tmp_path / "sequences"
    seq_lr = tmp_path / "sequences_LR"
    clips = [("00001", "0001"), ("00001", "0002"), ("00002", "0001")]
    for a, b in clips:
        (seq / a / b).mkdir(parents=True)
        (seq_lr / a / b).mkdir(parents=True)
        for i in range(1, 8):
            hr = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(seq / a / b / f"im{i}.png"), hr)
            cv2.imwrite(str(seq_lr / a / b / f"im{i}.png"), hr[::4, ::4])
    sep = tmp_path / "sep_trainlist.txt"
    sep.write_text("00001/0001\n00002/0001\n")
    return tmp_path


def test_sep_vimeo_and_ann(septuplet_tree):
    prep = _prep_module()
    dst = septuplet_tree / "train"
    prep.cmd_sep_vimeo(types.SimpleNamespace(
        src=str(septuplet_tree / "sequences"),
        list=str(septuplet_tree / "sep_trainlist.txt"),
        dst=str(dst),
    ))
    assert (dst / "00001" / "0001" / "im1.png").exists()
    assert (dst / "00002" / "0001" / "im7.png").exists()
    assert not (dst / "00001" / "0002").exists()  # not in the sep list

    ann = septuplet_tree / "meta_info_Vimeo90K_GT.txt"
    prep.cmd_ann(types.SimpleNamespace(
        dataset="vimeo", list=str(septuplet_tree / "sep_trainlist.txt"),
        dst=str(ann),
    ))
    assert ann.read_text().splitlines() == [
        "00001/0001 (256, 448, 3)", "00002/0001 (256, 448, 3)"]

    reds_ann = septuplet_tree / "meta_info_REDS_GT.txt"
    prep.cmd_ann(types.SimpleNamespace(dataset="reds", list=None,
                                       dst=str(reds_ann)))
    lines = reds_ann.read_text().split()
    assert len(lines) == 266 and "011" not in lines and "001" in lines


def test_pack_vimeo_and_dataset(septuplet_tree):
    """Packed Vimeo shard loads through VimeoDataset (train side)."""
    prep = _prep_module()
    hr_pack = str(septuplet_tree / "vimeo_hr.pack")
    lr_pack = str(septuplet_tree / "vimeo_lr.pack")
    prep.cmd_pack(types.SimpleNamespace(
        src=str(septuplet_tree / "sequences"), dst=hr_pack, layout="vimeo"))
    prep.cmd_pack(types.SimpleNamespace(
        src=str(septuplet_tree / "sequences_LR"), dst=lr_pack, layout="vimeo"))

    from vmg_tpu.data.storage import PackedBackend
    be = PackedBackend(hr_pack)
    assert "00001/0001_1" in be.index and "00002/0001_7" in be.index
    assert be.keys == ["00001/0001", "00001/0002", "00002/0001"]

    from vmg_tpu.configs.config import DatasetConfig
    from vmg_tpu.data import create_dataset

    cfg = DatasetConfig(
        name="Vimeo90k_septuplet", dataroot_HR=hr_pack, dataroot_LR=lr_pack,
        num_frames=7, crop_size=64, image_shape=(3, 256, 256),
        total_num_frames=7, pre_seed=0,
    )
    ds = create_dataset(cfg, scale=4)
    assert len(ds) == 3
    s = ds[0]
    assert s["LRs"].shape == (7, 16, 16, 3)
    assert s["HRs"].shape == (7, 64, 64, 3)
    # crop alignment: LR crop x4 == HR crop region (same source image)
    assert np.isfinite(s["LRs"]).all()


def test_vimeo_eval_cli_runs(septuplet_tree, tmp_path):
    """The eval CLI runs the Vimeo protocol (eval_mid_clip + mirrors) on the
    synthetic tree with a tiny random model."""
    import yaml

    cfg = {
        "name": "VMG-vimeo-smoke", "model": "VMG", "scale": 4,
        "if_train": False, "checkpoint_from": "mine",
        "dataset": {
            "name": "Vimeo90k_septuplet", "mode": "test",
            "dataset_root": str(septuplet_tree / "sequences_LR"),
            "gt_root": str(septuplet_tree / "sequences"),
            "num_frames": 7, "num_out_frames": 7,
            "image_shape": [3, 256, 256], "image_shape_r": [3, 256, 256],
            "use_mirrors": True, "eval_mid_clip": True,
            "overlapped_mode": "mid", "wins": None,
        },
        "network": {
            "embed_dim": [32, 32, 32], "depths": [2, 2, 2],
            "num_heads": [2, 4, 2], "num_frames": 14, "mlp_ratio": 2,
            "n_groups": 1,
            "window_sizes": [[2, 4, 4], [2, 4, 4], [2, 4, 4]],
            "spynet": "spynet", "flow_fix": None,
            "ltam": True, "traj_win": [14, None],
            "traj_keyframes_n": [3, None], "traj_heads": [2, None],
            "temporal_type": [False, None], "temporal_empty": True,
            "traj_res_n": [2, 0, 2], "spatial_type": [False, False],
            "mixer_type": ["mlps", "mlps"], "chunk_ratios": [0.25, 0.25],
            "twins": [2, 2], "image_size": [64, 64],
        },
        "path": {"output_dir": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "vimeo_smoke.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "eval.py"),
         "--config", str(cfg_path), "--checkpoint", "random",
         "--max-clips", "1"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # mid-clip protocol: exactly the 1 center frame scored for the clip
    log = proc.stderr + proc.stdout
    assert "[dataset] PSNR" in log
    out_pngs = list((tmp_path / "out" / "00001" / "0001").glob("*.png"))
    assert len(out_pngs) == 1  # only the scored center frame is written
