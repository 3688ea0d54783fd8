"""NoWDataset loader test with synthetic on-disk assets."""

import numpy as np

from e3dge_tpu.training.now_data import NoWDataset


def _make_now_assets(root, n=3):
    from PIL import Image

    (root / "final_release_version" / "iphone_pictures" / "subj1").mkdir(parents=True)
    (root / "final_release_version" / "detected_face" / "subj1").mkdir(parents=True)
    lines = []
    rng = np.random.RandomState(0)
    for i in range(n):
        rel = f"subj1/img{i}.jpg"
        arr = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "final_release_version" / "iphone_pictures" / rel)
        bbx = {"left": 200.0, "right": 400.0, "top": 100.0, "bottom": 320.0}
        np.save(root / "final_release_version" / "detected_face" / f"subj1/img{i}.npy", bbx)
        lines.append(rel)
    (root / "imagepathsvalidation.txt").write_text("\n".join(lines))


def test_now_dataset(tmp_path):
    _make_now_assets(tmp_path)
    ds = NoWDataset(tmp_path, crop_size=64)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (3, 64, 64)
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    assert item["subject"] == "subj1"
    batches = list(ds.iter_batches(2))
    assert batches[0]["image"].shape == (2, 3, 64, 64)
    assert len(batches[1]["imagename"]) == 1
