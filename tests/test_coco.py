"""COCO-format dataset: RLE/polygon decoding and the Sample contract."""

import json
import os

import numpy as np
import pytest

from basi_tpu.data.coco import (
    CocoDataset,
    polygons_to_mask,
    rle_decompress,
    rle_to_mask,
    segmentation_to_mask,
)


def _mask_to_counts(mask: np.ndarray) -> list[int]:
    """Inverse of rle_to_mask (column-major runs, starts with 0-run)."""
    flat = mask.T.reshape(-1)
    counts = []
    val = 0
    run = 0
    for v in flat:
        if v == val:
            run += 1
        else:
            counts.append(run)
            val = v
            run = 1
    counts.append(run)
    return counts


def _compress(counts: list[int]) -> str:
    """Test-side twin of the COCO string encoder (delta + 5-bit LEB)."""
    s = bytearray()
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            s.append(c + 48)
    return s.decode("ascii")


def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
    counts = _mask_to_counts(mask)
    np.testing.assert_array_equal(rle_to_mask(counts, 23, 31), mask)
    # compressed string form round-trips through the decoder too
    np.testing.assert_array_equal(
        rle_to_mask(rle_decompress(_compress(counts)), 23, 31), mask)


def test_rle_column_major_orientation():
    # 2x3 mask with a single pixel at (row 1, col 0): column-major runs
    # are [1, 1, 4] (one 0, one 1, four 0s).
    m = rle_to_mask([1, 1, 4], 2, 3)
    want = np.zeros((2, 3), np.uint8)
    want[1, 0] = 1
    np.testing.assert_array_equal(m, want)


def test_polygon_fill_square():
    m = polygons_to_mask([[2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0]], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    # PIL fills the closed polygon incl. outline: area close to 7x7
    assert 36 <= int(m.sum()) <= 64


def test_segmentation_dispatch():
    rle = {"size": [4, 4], "counts": [3, 1, 12]}
    m = segmentation_to_mask(rle, 4, 4)
    assert m.sum() == 1 and m[3, 0] == 1
    with pytest.raises(ValueError, match="size"):
        segmentation_to_mask({"size": [2, 2], "counts": [4]}, 4, 4)


def _write_coco_tree(root, n_extra_anns=0):
    from PIL import Image

    rng = np.random.RandomState(3)
    img_dir = os.path.join(root, "val")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    images, annotations = [], []
    aid = 1
    # image 1: 40x64 (non-square -> letterbox path), polygon + RLE anns
    for iid, (h, w) in enumerate([(40, 64), (32, 32)], start=1):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"im{iid}.jpg"
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=95)
        images.append({"id": iid, "file_name": name,
                       "height": h, "width": w})
        # big polygon box (largest -> slot 0)
        annotations.append({
            "id": aid, "image_id": iid, "category_id": 1,
            "segmentation": [[2, 2, w * 0.6, 2, w * 0.6, h * 0.6,
                              2, h * 0.6]],
            "area": (w * 0.6 - 2) * (h * 0.6 - 2), "iscrowd": 0})
        aid += 1
        # small RLE blob (uncompressed): 3x3 square at (1,1)
        m = np.zeros((h, w), np.uint8)
        m[1:4, 1:4] = 1
        annotations.append({
            "id": aid, "image_id": iid, "category_id": 2,
            "segmentation": {"size": [h, w],
                             "counts": _mask_to_counts(m)},
            "area": 9.0, "iscrowd": 0})
        aid += 1
        # crowd region: must be skipped
        annotations.append({
            "id": aid, "image_id": iid, "category_id": 3,
            "segmentation": {"size": [h, w],
                             "counts": _compress(_mask_to_counts(m))},
            "area": 9.0, "iscrowd": 1})
        aid += 1
    with open(os.path.join(ann_dir, "instances_val.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1}, {"id": 2}, {"id": 3}]}, f)


def test_coco_dataset_end_to_end(tmp_path):
    root = str(tmp_path / "coco")
    os.makedirs(root)
    _write_coco_tree(root)
    ds = CocoDataset(root, image_size=64, max_instances=4, split="val")
    assert len(ds) == 2
    s = ds.get(0)
    assert s.image.shape == (64, 64, 3) and s.image.dtype == np.uint8
    assert s.masks.shape == (4, 64, 64)
    # crowd skipped: exactly 2 valid instances, largest (polygon) first
    np.testing.assert_array_equal(s.valid, [1, 1, 0, 0])
    assert s.masks[0].sum() > s.masks[1].sum() > 0
    # im1.jpg is 40x64: letterboxed content is 40x64 (fits exactly)
    np.testing.assert_array_equal(s.orig_hw, [40, 64])
    np.testing.assert_array_equal(s.valid_hw, [40, 64])
    assert s.masks[:, 40:].sum() == 0  # nothing below the content rows

    # original-resolution GT for ap_at_original
    mo, vo = ds.get_orig_masks(0)
    assert mo.shape == (4, 40, 64)
    np.testing.assert_array_equal(vo, [1, 1, 0, 0])
    assert mo[1].sum() == 9  # the 3x3 RLE blob, exact at native res

    # batch decode path produces identical samples
    batch = ds.get_batch([0, 1])
    for bi, i in enumerate([0, 1]):
        one = ds.get(i)
        np.testing.assert_array_equal(batch[bi].image, one.image)
        np.testing.assert_array_equal(batch[bi].masks, one.masks)
        np.testing.assert_array_equal(batch[bi].valid, one.valid)


def test_coco_via_make_dataset_and_epoch(tmp_path):
    import dataclasses

    from basi_tpu.data.datasets import iter_epoch, make_dataset
    from helpers import tiny_config

    root = str(tmp_path / "coco")
    os.makedirs(root)
    _write_coco_tree(root)
    cfg = tiny_config()
    dcfg = dataclasses.replace(
        cfg.data, dataset="coco", root=root, split="val", image_size=64,
        max_instances=4)
    ds = make_dataset(dcfg, split="val")
    assert type(ds).__name__ == "CocoDataset"
    batches = list(iter_epoch(ds, 2, shuffle=False, seed=0))
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[0]["masks"].shape == (2, 4, 64, 64)


def test_coco_missing_annotations_raises(tmp_path):
    root = str(tmp_path / "empty")
    os.makedirs(os.path.join(root, "annotations"))
    with pytest.raises(FileNotFoundError, match="ann"):
        CocoDataset(root, split="val")


def test_coco_year_convention_layout(tmp_path):
    """Standard COCO-2017 layout: annotations/instances_val2017.json +
    val2017/ image dir — the image dir must be derived from the annotation
    file name, and a decoy instances_minival.json must NOT be picked for
    split='val' (anchored matching, not substring)."""
    from PIL import Image

    root = str(tmp_path / "coco17")
    img_dir = os.path.join(root, "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
        os.path.join(img_dir, "im1.jpg"), quality=95)
    doc = {"images": [{"id": 1, "file_name": "im1.jpg",
                       "height": 32, "width": 32}],
           "annotations": [{"id": 1, "image_id": 1, "iscrowd": 0,
                            "area": 64.0,
                            "segmentation": [[4, 4, 20, 4, 20, 12, 4, 12]]}]}
    with open(os.path.join(ann_dir, "instances_val2017.json"), "w") as f:
        json.dump(doc, f)
    # decoy: sorts BEFORE instances_val2017.json; substring-matches 'val'
    with open(os.path.join(ann_dir, "instances_minival.json"), "w") as f:
        json.dump({"images": [], "annotations": []}, f)

    ds = CocoDataset(root, image_size=32, max_instances=2, split="val")
    assert len(ds) == 1
    s = ds.get(0)
    assert s.valid.sum() == 1 and s.masks[0].sum() > 0


def test_coco_wrong_image_dir_raises(tmp_path):
    """Annotations that reference images none of which exist on disk must
    fail loudly, not construct a 0-length dataset."""
    root = str(tmp_path / "coco_bad")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir)
    doc = {"images": [{"id": 1, "file_name": "nope.jpg",
                       "height": 8, "width": 8}],
           "annotations": [{"id": 1, "image_id": 1, "iscrowd": 0,
                            "area": 4.0,
                            "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]]}]}
    with open(os.path.join(ann_dir, "instances_val.json"), "w") as f:
        json.dump(doc, f)
    with pytest.raises(FileNotFoundError, match="none"):
        CocoDataset(root, image_size=32, split="val")


def test_coco_degenerate_annotation_does_not_evict_real_instance(tmp_path):
    """A degenerate (<3-point) polygon with a huge declared area must not
    occupy a slot under the max_instances cap at the expense of a real
    instance."""
    from PIL import Image

    root = str(tmp_path / "coco_degen")
    img_dir = os.path.join(root, "val")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
        os.path.join(img_dir, "im1.jpg"), quality=95)
    anns = [
        # degenerate: 2-point polygon, declared area sorts it FIRST
        {"id": 1, "image_id": 1, "iscrowd": 0, "area": 1e9,
         "segmentation": [[1, 1, 2, 2]]},
        # two real instances
        {"id": 2, "image_id": 1, "iscrowd": 0, "area": 100.0,
         "segmentation": [[2, 2, 14, 2, 14, 14, 2, 14]]},
        {"id": 3, "image_id": 1, "iscrowd": 0, "area": 50.0,
         "segmentation": [[18, 18, 28, 18, 28, 28, 18, 28]]},
    ]
    doc = {"images": [{"id": 1, "file_name": "im1.jpg",
                       "height": 32, "width": 32}],
           "annotations": anns}
    with open(os.path.join(ann_dir, "instances_val.json"), "w") as f:
        json.dump(doc, f)

    ds = CocoDataset(root, image_size=32, max_instances=2, split="val")
    masks, valid = ds._orig_masks(ds.images[0])
    assert valid.sum() == 2, "real instance was evicted by a degenerate ann"
    assert masks[0].sum() > 0 and masks[1].sum() > 0


def test_mask_to_counts_roundtrip_random():
    """Product encoder vs the naive test twin + decode round-trip."""
    from basi_tpu.data.coco import mask_to_counts, rle_to_mask

    rng = np.random.RandomState(7)
    for _ in range(20):
        h, w = rng.randint(1, 40, size=2)
        m = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        counts = mask_to_counts(m)
        assert counts == _mask_to_counts(m)  # matches the naive twin
        np.testing.assert_array_equal(rle_to_mask(counts, h, w), m)


def test_rle_compress_roundtrip_random():
    from basi_tpu.data.coco import (mask_to_counts, mask_to_rle,
                                    rle_compress, rle_decompress,
                                    rle_to_mask)

    rng = np.random.RandomState(8)
    for _ in range(20):
        h, w = rng.randint(1, 64, size=2)
        m = (rng.rand(h, w) > 0.5).astype(np.uint8)
        counts = mask_to_counts(m)
        s = rle_compress(counts)
        # roundtrip through the INDEPENDENT decoder is the real check
        # (the _compress twin shares the encoder's algorithm)
        assert rle_decompress(s) == counts
        seg = mask_to_rle(m)
        assert seg["size"] == [h, w]
        np.testing.assert_array_equal(
            rle_to_mask(rle_decompress(seg["counts"]), h, w), m)


def test_mask_to_counts_edge_cases():
    from basi_tpu.data.coco import mask_to_counts, rle_to_mask

    for m in (np.zeros((3, 4), np.uint8), np.ones((3, 4), np.uint8),
              np.eye(5, dtype=np.uint8)):
        c = mask_to_counts(m)
        np.testing.assert_array_equal(rle_to_mask(c, *m.shape), m)


def test_coco_empty_split_dir_does_not_shadow_year_dir(tmp_path):
    """An empty root/val dir must not shadow root/val2017: the image dir
    is the first candidate that CONTAINS an annotated image."""
    from PIL import Image

    root = str(tmp_path / "coco17b")
    os.makedirs(os.path.join(root, "val"))  # empty decoy
    img_dir = os.path.join(root, "val2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.RandomState(2)
    Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(
        os.path.join(img_dir, "im1.jpg"), quality=95)
    doc = {"images": [{"id": 1, "file_name": "im1.jpg",
                       "height": 24, "width": 24}],
           "annotations": [{"id": 1, "image_id": 1, "iscrowd": 0,
                            "area": 36.0,
                            "segmentation": [[2, 2, 12, 2, 12, 8, 2, 8]]}]}
    with open(os.path.join(ann_dir, "instances_val2017.json"), "w") as f:
        json.dump(doc, f)
    ds = CocoDataset(root, image_size=32, max_instances=2, split="val")
    assert len(ds) == 1
    assert ds.img_dir.endswith("val2017")


def test_coco_inconsistent_annotation_ids_raise(tmp_path):
    """Annotations whose image_ids never appear in doc['images'] are an
    inconsistent JSON, not a missing image dir."""
    root = str(tmp_path / "coco_bad2")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir)
    doc = {"images": [{"id": 7, "file_name": "im7.jpg",
                       "height": 8, "width": 8}],
           "annotations": [{"id": 1, "image_id": 99, "iscrowd": 0,
                            "area": 4.0,
                            "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]]}]}
    with open(os.path.join(ann_dir, "instances_val.json"), "w") as f:
        json.dump(doc, f)
    with pytest.raises(ValueError, match="inconsistent"):
        CocoDataset(root, image_size=32, split="val")


def test_eval_results_export_uses_true_coco_ids(tmp_path, capsys):
    """basi eval --results on a CocoDataset: the exported entries carry
    the annotation JSON's TRUE image ids and original-resolution RLEs —
    the file drops into pycocotools COCOeval against the same JSON."""
    from basi_tpu.cli import main
    from basi_tpu.data.coco import rle_decompress, rle_to_mask

    root = str(tmp_path / "coco")
    os.makedirs(root)
    _write_coco_tree(root)
    res_path = tmp_path / "r.json"
    args = []
    for kv in ["model.backbone=resnet_tiny", "model.image_size=64",
               "model.grid_size=8", "model.fpn_channels=32",
               "model.mask_channels=32", "data.image_size=64",
               "data.dataset=coco", f"data.root={root}", "data.split=val",
               "data.max_instances=4", "infer.batch_size=2",
               "infer.dtype=float32", "infer.score_threshold=0.0",
               "parallel.num_devices=1"]:
        args += ["--set", kv]
    rc = main(["eval", *args, "--results", str(res_path)])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    entries = json.loads(res_path.read_text())
    assert metrics["num_results"] == len(entries) and entries
    sizes = {1: [40, 64], 2: [32, 32]}  # ids from _write_coco_tree
    assert {e["image_id"] for e in entries} <= set(sizes)
    for e in entries:
        assert e["segmentation"]["size"] == sizes[e["image_id"]]
        h, w = e["segmentation"]["size"]
        m = rle_to_mask(rle_decompress(e["segmentation"]["counts"]), h, w)
        assert m.any()
