"""VGG16 backbone option (SURVEY.md §2.6), NHWC, exposing a 4-level pyramid.

The reference offers a VGG16 variant alongside ResNet-50. The pyramid taps
are conv3_3 (/4), conv4_3 (/8), conv5_3 (/16), and max-pooled conv5_3
(/32) — pools are applied *before* each block (torchvision "features"
layout) — so the FPN sees the same (/4, /8, /16, /32) stride set as
ResNet's C2..C5. conv1/conv2 run at /1 and /2 and are not exposed.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

class VGG16(nn.Module):
    """VGG16 trunk returning a 4-level (C2..C5) pyramid at strides 4/8/16/32."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None  # unused: classic VGG16 has no BatchNorm

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        del train  # VGG has no BatchNorm in the classic torchvision variant
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cfg = [  # (block, [channels...])
            (1, [64, 64]),
            (2, [128, 128]),
            (3, [256, 256, 256]),
            (4, [512, 512, 512]),
            (5, [512, 512, 512]),
        ]
        feats = {}
        for block, chans in cfg:
            if block > 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for i, ch in enumerate(chans):
                x = nn.Conv(
                    ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{block}_{i + 1}", **kw,
                )(x)
                x = nn.relu(x)
            feats[block] = x
        # Align strides with ResNet's C2..C5 = /4,/8,/16,/32:
        c2 = feats[3]  # /4
        c3 = feats[4]  # /8
        c4 = feats[5]  # /16
        c5 = nn.max_pool(feats[5], (2, 2), strides=(2, 2))  # /32
        return (c2, c3, c4, c5)
