"""Vid4/UDM10 evaluation capability: preset configs load, the eval CLI's
name dispatch resolves the GT tree, and the end-to-end loop produces
per-clip metrics on a synthetic Vid4-style dataset
(reference capability: README.md:30-37, tools/test_reds4.py:148-163)."""

import os
import sys

import numpy as np
import cv2
import pytest

PRESETS = os.path.join(os.path.dirname(__file__), os.pardir, "vmg_tpu",
                       "configs", "presets")


def test_vid4_udm10_presets_load():
    from vmg_tpu.configs import load_config

    vid4 = load_config(os.path.join(PRESETS, "vmg_eval_vid4.yml"),
                       is_train=False)
    assert vid4.dataset.name == "Vid4"
    assert vid4.dataset.num_out_frames >= 1000  # whole-clip windows
    udm = load_config(os.path.join(PRESETS, "vmg_eval_udm10.yml"),
                      is_train=False)
    assert udm.dataset.name == "Udm10"
    # full flagship network in both
    assert tuple(vid4.network.embed_dim) == (112, 224, 224, 448, 224, 224,
                                             112)
    assert tuple(udm.network.embed_dim) == tuple(vid4.network.embed_dim)


def _write_clip(root, clip, n, h, w, seed):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, clip), exist_ok=True)
    frames = []
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, clip, f"{i:08d}.png"), img)
        frames.append(img)
    return frames


def test_eval_cli_vid4_dispatch_end_to_end(tmp_path, monkeypatch):
    """Drive tools/eval.py main() on a synthetic <root>/LR/X4 + <root>/GT
    tree with a tiny network; checks the LR/X4 -> GT name dispatch and the
    whole-clip window protocol."""
    import yaml

    lr_root = str(tmp_path / "Vid4" / "LR" / "X4")
    gt_root = str(tmp_path / "Vid4" / "GT")
    T, h, w = 4, 64, 64
    for clip in ("calendar", "city"):
        _write_clip(lr_root, clip, T, h, w, seed=hash(clip) % 100)
        _write_clip(gt_root, clip, T, 4 * h, 4 * w, seed=hash(clip) % 100)

    tiny = yaml.safe_load(
        open(os.path.join(PRESETS, "vmg_tiny_demo.yml")))
    cfg = yaml.safe_load(open(os.path.join(PRESETS, "vmg_eval_vid4.yml")))
    cfg["network"] = tiny["network"]
    cfg["dataset"]["dataset_root"] = lr_root
    cfg["dataset"]["gt_root"] = None  # exercise the name dispatch
    cfg["dataset"]["num_frames"] = T
    cfg["dataset"]["image_shape"] = [3, 4 * h, 4 * w]
    cfg["dataset"]["wins"] = None
    cfg["path"]["output_dir"] = str(tmp_path / "out")
    cfg_path = str(tmp_path / "vid4_tiny.yml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    import importlib

    eval_mod = importlib.import_module("eval")
    monkeypatch.setattr(sys, "argv",
                        ["eval.py", "--config", cfg_path,
                         "--checkpoint", "random", "--topk", "1"])
    eval_mod.main()

    # per-clip outputs written for every frame of both clips
    for clip in ("calendar", "city"):
        out_dir = os.path.join(str(tmp_path / "out"), clip)
        pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
        assert len(pngs) == T, (clip, pngs)
        img = cv2.imread(os.path.join(out_dir, sorted(pngs)[0]))
        assert img.shape == (4 * h, 4 * w, 3)
