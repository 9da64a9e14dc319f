"""Ingest-included e2e benchmark path (VERDICT r2 item 4): files ->
C++ decode -> feed -> forward, exercised end-to-end on a tiny model so the
TPU run of `bench --mode e2e` can't be the first time the code executes."""

from basi_tpu.benchmark import _bench_e2e

TINY = [
    "model.backbone=resnet_tiny",
    "model.image_size=64",
    "model.grid_size=8",
    "model.fpn_channels=32",
    "model.mask_channels=32",
    "model.num_slots=8",
    "model.stem_mode=conv7",
    "data.image_size=64",
    "data.max_instances=4",
    "infer.dtype=float32",
]


def test_bench_e2e_smoke():
    res = _bench_e2e(n_images=24, batch_size=4, extra_overrides=TINY)
    assert res["unit"] == "images/sec"
    assert res["value"] > 0
    assert res["ingest_only_imgs_per_s"] > 0
    assert res["host_cores"] >= 1
    assert res["cores_to_saturate_device_headline"] >= 1
    # forward can only slow ingest down, never speed it up
    assert res["value"] <= res["ingest_only_imgs_per_s"] * 1.5
    # shard-cache passes ran and produced sane rates (decode-once path)
    assert res["shards_e2e_imgs_per_s"] > 0
    assert res["shards_ingest_only_imgs_per_s"] > 0
    # host-only: mmap-speed shard reads must beat the decode path
    assert (res["host_only_shards_imgs_per_s"]
            > res["host_only_decode_imgs_per_s"])
