"""CLI surface tests: the two public entrypoints (train/infer) run end to
end on tiny synthetic configs, mirroring the reference's MyTrain/MyTest."""

import json

import pytest

from basi_tpu.cli import main

TINY = [
    "--set", "model.backbone=resnet_tiny",
    "--set", "model.image_size=64",
    "--set", "model.grid_size=8",
    "--set", "model.fpn_channels=32",
    "--set", "model.mask_channels=32",
    "--set", "data.image_size=64",
    "--set", "data.dataset=synthetic",
    "--set", "data.batch_size=4",
    "--set", "data.synthetic_n=16",
    "--set", "data.max_instances=4",
    "--set", "infer.batch_size=4",
    "--set", "infer.dtype=float32",
    "--set", "parallel.num_devices=1",
]


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """One tiny CLI training run shared by every test that needs a
    checkpoint — `basi train` itself is exercised here."""
    root = tmp_path_factory.mktemp("cli_train")
    rc = main(["train", *TINY,
               "--set", f"train.checkpoint_dir={root}/ckpt",
               "--set", "train.epochs=1",
               "--metrics", f"{root}/m.jsonl"])
    assert rc == 0
    return root


def test_cli_train_and_infer(trained_ckpt, capsys):
    # train ran in the fixture; check its artifacts
    lines = (trained_ckpt / "m.jsonl").read_text().strip().splitlines()
    assert any('"loss"' in l for l in lines)

    rc = main(["infer", *TINY, "--max-batches", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    metrics = json.loads(out.strip().splitlines()[-1])
    assert "AP@0.5" in metrics and "num_images" in metrics


def test_cli_bad_override():
    with pytest.raises(KeyError):
        main(["train", "--set", "nope.nope=1"])


def test_cli_preset_unknown():
    with pytest.raises(KeyError):
        main(["train", "--preset", "definitely-not-a-preset"])


def test_cli_export_roundtrip(trained_ckpt, tmp_path):
    rc = main(["export", *TINY,
               "--checkpoint", f"{trained_ckpt}/ckpt",
               "--out", f"{tmp_path}/exported"])
    assert rc == 0
    rc = main(["infer", *TINY,
               "--checkpoint", f"{tmp_path}/exported",
               "--max-batches", "1"])
    assert rc == 0


def test_cli_export_keeps_float32(trained_ckpt, tmp_path):
    """`basi export` must never bake bf16 weights (the default infer.dtype
    is bfloat16 and round-1 cast params in place before exporting)."""
    import jax
    import numpy as np

    from basi_tpu.utils.checkpoint import load_params

    # strip TINY's infer.dtype=float32 so the preset default (bfloat16)
    # applies — that's the footgun being tested
    args = list(TINY)
    i = args.index("infer.dtype=float32")
    del args[i - 1:i + 1]

    # note: NO infer.dtype override -> default bfloat16
    rc = main(["export", *args,
               "--checkpoint", f"{trained_ckpt}/ckpt",
               "--out", f"{tmp_path}/exported"])
    assert rc == 0
    restored = load_params(f"{tmp_path}/exported")
    leaves = [x for x in jax.tree.leaves(restored["params"])]
    assert all(np.asarray(x).dtype == np.float32 for x in leaves)


def test_cli_import_torch_full(tmp_path, capsys):
    """`basi import` converts a torch BASINet .pth into an orbax export the
    Inferencer can load — the reference-checkpoint on-ramp (SURVEY §5.4)."""
    import torch

    from torch_basi import TorchBASINet

    tmodel = TorchBASINet(stage_sizes=(1, 1, 1, 1), fpn_ch=32, mask_ch=32,
                          grid=8).eval()
    torch.save(tmodel.state_dict(), f"{tmp_path}/ref.pth")

    args = TINY
    rc = main(["import", *args,
               "--torch", f"{tmp_path}/ref.pth",
               "--out", f"{tmp_path}/imported"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["what"] == "full"
    rc = main(["infer", *args,
               "--checkpoint", f"{tmp_path}/imported",
               "--max-batches", "1"])
    assert rc == 0


def test_cli_import_torch_full_vgg16(tmp_path, capsys):
    """`basi import --what full` on the reference's VGG16 variant: the
    whole state_dict (features.* trunk + heads) converts and the export
    loads for inference."""
    import torch

    from torch_basi import TorchBASINet

    tmodel = TorchBASINet(fpn_ch=32, mask_ch=32, grid=8,
                          backbone="vgg16").eval()
    torch.save(tmodel.state_dict(), f"{tmp_path}/ref.pth")

    args = [a if a != "model.backbone=resnet_tiny"
            else "model.backbone=vgg16" for a in TINY]
    rc = main(["import", *args,
               "--torch", f"{tmp_path}/ref.pth",
               "--out", f"{tmp_path}/imported"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["what"] == "full"
    rc = main(["infer", *args,
               "--checkpoint", f"{tmp_path}/imported",
               "--max-batches", "1"])
    assert rc == 0


def test_cli_import_full_rejects_unknown_backbone(tmp_path):
    """--what full maps ResNet-family and vgg16 state_dicts; any other
    backbone must get a clear error BEFORE the torch file is touched (not
    an opaque missing-key crash inside the converter)."""
    with pytest.raises(ValueError, match="full import unsupported"):
        main(["import", *TINY,
              "--set", "model.backbone=densenet",
              "--torch", f"{tmp_path}/nonexistent.pth",
              "--out", f"{tmp_path}/imported"])


def test_cli_import_shape_mismatch_fails(tmp_path):
    """Silent conversion mismatches surface only as AP drift — the CLI must
    fail fast with a readable diff instead."""
    import torch

    from torch_basi import TorchBASINet

    # grid=4 produces instance-head trees whose shapes can't match grid=8
    tmodel = TorchBASINet(stage_sizes=(1, 1, 1, 1), fpn_ch=32, mask_ch=16,
                          grid=4).eval()
    torch.save(tmodel.state_dict(), f"{tmp_path}/ref.pth")
    with pytest.raises(ValueError, match="do not match the model"):
        main(["import", *TINY,
              "--torch", f"{tmp_path}/ref.pth",
              "--out", f"{tmp_path}/imported"])


def test_cli_predict_writes_pngs(trained_ckpt, tmp_path, capsys):
    """basi predict: raw image files in (no labels), one labeled-instance
    PNG per input stem out, batch tail padded to the static batch shape
    (3 images through batch_size=4)."""
    import numpy as np
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i, (h, w) in enumerate([(48, 64), (64, 64), (80, 56)]):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            img_dir / f"photo{i}.png")

    out_dir = tmp_path / "preds"
    rc = main(["predict", *TINY,
               "--set", "infer.score_threshold=0.0",
               "--images", str(img_dir), "--out", str(out_dir),
               "--checkpoint", f"{trained_ckpt}/ckpt"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["images"] == 3
    assert len(summary["results"]) == 3
    for i, (h, w) in enumerate([(48, 64), (64, 64), (80, 56)]):
        p = out_dir / f"photo{i}.png"
        assert p.exists(), p
        from PIL import Image as I
        assert I.open(p).size == (w, h)  # pasted back to ORIGINAL size


def test_cli_predict_missing_path():
    with pytest.raises(FileNotFoundError):
        main(["predict", *TINY, "--images", "/definitely/not/here",
              "--checkpoint", "/unused"])


def test_cli_predict_requires_checkpoint(tmp_path):
    """No --checkpoint -> argparse error (random weights would silently
    write garbage PNGs with exit code 0)."""
    with pytest.raises(SystemExit):
        main(["predict", *TINY, "--images", str(tmp_path)])


def test_cli_predict_dedupes_colliding_stems(trained_ckpt, tmp_path, capsys):
    """Inputs from different directories sharing a basename must not
    overwrite each other's output PNG."""
    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(1)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    Image.fromarray((rng.rand(40, 48, 3) * 255).astype(np.uint8)).save(
        d1 / "photo.png")
    Image.fromarray((rng.rand(56, 40, 3) * 255).astype(np.uint8)).save(
        d2 / "photo.png")
    out_dir = tmp_path / "preds"
    rc = main(["predict", *TINY,
               "--set", "infer.score_threshold=0.0",
               "--images", str(d1), str(d2), "--out", str(out_dir),
               "--checkpoint", f"{trained_ckpt}/ckpt"])
    assert rc == 0
    from PIL import Image as I
    assert I.open(out_dir / "photo.png").size == (48, 40)
    assert I.open(out_dir / "photo_1.png").size == (40, 56)


def test_cli_predict_coco_results_json(trained_ckpt, tmp_path, capsys):
    """--results writes a COCO-format results JSON whose RLE segmentations
    decode to original-resolution masks (pycocotools-compatible layout:
    image_id from all-digit stems)."""
    import numpy as np
    from PIL import Image

    from basi_tpu.data.coco import rle_decompress, rle_to_mask

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(2)
    # COCO-style all-digit name + a non-digit name
    Image.fromarray((rng.rand(40, 48, 3) * 255).astype(np.uint8)).save(
        img_dir / "000000000042.png")
    Image.fromarray((rng.rand(56, 40, 3) * 255).astype(np.uint8)).save(
        img_dir / "photo.png")
    res_path = tmp_path / "results.json"
    rc = main(["predict", *TINY,
               "--set", "infer.score_threshold=0.0",
               "--images", str(img_dir), "--out", str(tmp_path / "preds"),
               "--results", str(res_path),
               "--checkpoint", f"{trained_ckpt}/ckpt"])
    assert rc == 0
    entries = json.loads(res_path.read_text())
    assert entries, "no results written"
    ids = {e["image_id"] for e in entries}
    assert 42 in ids and "photo" in ids
    by_id = {42: (40, 48), "photo": (56, 40)}
    for e in entries:
        assert 0.0 <= e["score"] <= 1.0 and e["category_id"] == 1
        h, w = e["segmentation"]["size"]
        assert (h, w) == by_id[e["image_id"]]
        m = rle_to_mask(rle_decompress(e["segmentation"]["counts"]), h, w)
        assert m.any()


def test_cli_predict_results_counts_match_summary(trained_ckpt, tmp_path,
                                                  capsys):
    """The stdout summary's per-image instance count and the results-JSON
    entry count use ONE keep predicate — they must agree. Duplicate
    all-digit stems from different dirs keep their numeric image_id (a
    dedup suffix must not leak into the id) and warn about the merge."""
    import warnings

    import numpy as np
    from PIL import Image

    rng = np.random.RandomState(5)
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    for d in (d1, d2):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            d / "000000000007.png")
    res_path = tmp_path / "r.json"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rc = main(["predict", *TINY,
                   "--set", "infer.score_threshold=0.0",
                   "--images", str(d1), str(d2),
                   "--out", str(tmp_path / "preds"),
                   "--results", str(res_path),
                   "--checkpoint", f"{trained_ckpt}/ckpt"])
    assert rc == 0
    assert any("duplicate COCO image_id" in str(x.message) for x in w)
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    entries = json.loads(res_path.read_text())
    assert all(e["image_id"] == 7 for e in entries)  # numeric, no suffix
    total = sum(r["instances"] for r in summary["results"])
    assert total == len(entries), (total, len(entries))
