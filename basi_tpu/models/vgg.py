"""VGG backbone option (SURVEY.md §2.6), NHWC, exposing a 4-level pyramid.

The reference offers a VGG16 variant alongside ResNet-50 (VGG19 is the
same trunk with (2,2,4,4,4) convs per block). The pyramid taps are the
last conv of block 3 (/4), block 4 (/8), block 5 (/16), and max-pooled
block 5 (/32) — pools are applied *before* each block (torchvision
"features" layout) — so the FPN sees the same (/4, /8, /16, /32) stride
set as ResNet's C2..C5. conv1/conv2 run at /1 and /2 and are not exposed.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

# convs per block, torchvision naming (the block/channel structure is
# shared; depth is the only difference between family members)
VGG_DEPTHS = {
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}
_CHANNELS = (64, 128, 256, 512, 512)


class VGG16(nn.Module):
    """VGG trunk returning a 4-level (C2..C5) pyramid at strides 4/8/16/32.

    ``depths`` selects the family member (VGG_DEPTHS); the class keeps its
    historical VGG16 name the way ResNet50 hosts every ResNet depth."""

    depths: Sequence[int] = VGG_DEPTHS["vgg16"]
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None  # unused: classic VGG has no BatchNorm
    bn_impl: str = "xla"  # unused, kwargs-compat with the ResNet trunk

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        del train  # VGG has no BatchNorm in the classic torchvision variant
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cfg = [(b + 1, [ch] * n)
               for b, (n, ch) in enumerate(zip(self.depths, _CHANNELS))]
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
