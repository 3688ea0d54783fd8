"""Offline tooling: video writer, gallery composer, dir-vs-dir metrics script.

Reference counterparts: helper_scripts/gallary_video.py (mix_tex_geo_vid + tiled
gallery + FFmpegWriter) and helper_scripts/calc_losses_on_images.py (GTResDataset
filename pairing, per-image scores json)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


def test_write_video_roundtrip(tmp_path):
    from e3dge_tpu.utils.image_io import write_video

    frames = np.linspace(-1, 1, 4 * 3 * 8 * 8, dtype=np.float32).reshape(4, 3, 8, 8)
    out = write_video(tmp_path / "v.mp4", frames, fps=5)
    assert out.exists() and out.stat().st_size > 0
    # mp4 via cv2 when available, .gif fallback otherwise — both are real files
    assert out.suffix in (".mp4", ".gif")


def test_gallery_mix_and_tile():
    from gallery_video import mix_tex_geo, tile

    tex = np.zeros((2, 3, 3, 4, 8), np.float32)
    geo = np.ones((2, 3, 3, 2, 4), np.float32)  # different res -> resized
    mixed = mix_tex_geo(tex, geo)
    assert np.all(mixed[..., :4] == 0) and np.all(mixed[..., 4:] == 1)

    grid = tile(mixed, cols=2)  # [V, 3, H, 2W] with one batch row
    assert grid.shape == (3, 3, 4, 16)
    # padded slot (batch 2 into 2 cols -> exactly filled, no padding row)
    grid3 = tile(np.ones((3, 2, 3, 4, 8), np.float32), cols=2)
    assert grid3.shape == (2, 3, 8, 16)
    assert np.all(grid3[:, :, 4:, 8:] == -1)  # 4th slot is black padding


def test_calc_losses_l2_pairing(tmp_path):
    from PIL import Image

    res_d, gt_d = tmp_path / "results", tmp_path / "gt"
    res_d.mkdir(), gt_d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        a = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(a).save(res_d / f"{i}.png")
        Image.fromarray(a if i == 0 else 255 - a).save(gt_d / f"{i}.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(res_d / "orphan.png")  # no gt pair

    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "calc_losses.py"), "--mode", "l2",
         "--data-path", str(res_d), "--gt-path", str(gt_d), "--size", "16"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    scores = json.loads((tmp_path / "inference_metrics" / "scores_l2.json").read_text())
    assert set(scores) == {"0.png", "1.png", "2.png"}  # orphan skipped
    assert scores["0.png"] < 1e-6 < scores["1.png"]
