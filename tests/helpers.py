"""Shared test helpers: tiny configs and batches."""

import dataclasses

import numpy as np

from basi_tpu.config import Config, DataConfig, ModelConfig, TrainConfig, InferConfig


def tiny_config(batch_size: int = 8, image_size: int = 64) -> Config:
    return Config(
        model=ModelConfig(
            backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
            grid_size=8, num_slots=8, image_size=image_size,
        ),
        data=DataConfig(
            dataset="synthetic", batch_size=batch_size,
            image_size=image_size, max_instances=4,
        ),
        train=TrainConfig(
            epochs=1, steps_per_epoch=2, lr=1e-3, log_every=1,
            checkpoint_dir="", resume="none",
        ),
        infer=InferConfig(batch_size=batch_size, dtype="float32",
                          pre_nms_top_k=16,
                          # Keep unit tests from writing ./out/native_gt;
                          # the cache has its own tmp_path-scoped tests.
                          native_gt_cache=""),
    )


def tiny_batch(rng: np.random.RandomState, n: int = 8, size: int = 64,
               m: int = 4) -> dict:
    imgs = (rng.rand(n, size, size, 3) * 255).astype(np.uint8)
    masks = np.zeros((n, m, size, size), np.uint8)
    valid = np.zeros((n, m), np.uint8)
    for i in range(n):
        k = rng.randint(1, m + 1)
        for j in range(k):
            cy, cx = rng.randint(8, size - 8, size=2)
            r = rng.randint(4, size // 4)
            yy, xx = np.mgrid[0:size, 0:size]
            masks[i, j] = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)
            valid[i, j] = 1
    return {"image": imgs, "masks": masks, "valid": valid}
