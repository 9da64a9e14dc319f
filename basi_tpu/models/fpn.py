"""FPN-style upsampling decoder (SURVEY.md §2.7).

Lateral 1x1 convs onto a shared width, top-down 2x bilinear upsample
(exact torch ``align_corners=False`` semantics via basi_tpu.ops.resize),
3x3 smoothing convs. Produces P2..P5 at strides 4/8/16/32.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from basi_tpu.ops.resize import upsample2x


class FPNDecoder(nn.Module):
    channels: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> tuple[jnp.ndarray, ...]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        n = len(feats)
        laterals = [
            nn.Conv(self.channels, (1, 1), name=f"lateral{i}", **kw)(f)
            for i, f in enumerate(feats)
        ]
        # Top-down pathway: coarsest to finest.
        outs = [None] * n
        prev = laterals[-1]
        outs[-1] = prev
        for i in range(n - 2, -1, -1):
            prev = laterals[i] + upsample2x(prev)
            outs[i] = prev
        smoothed = tuple(
            nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"smooth{i}", **kw)(o)
            for i, o in enumerate(outs)
        )
        return smoothed  # P2..P5
