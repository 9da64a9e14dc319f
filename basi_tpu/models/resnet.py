"""ResNet-50 backbone, NHWC, exposing the C2-C5 feature pyramid.

Re-designed TPU-first (SURVEY.md §2.6): NHWC layout so XLA tiles convs onto
the MXU without transposes; BatchNorm uses frozen running statistics during
inference and batch stats during training, matching torch semantics so the
torch->JAX weight importer (basi_tpu.convert) reproduces reference-pretrained
backbones bit-for-bit (eps 1e-5).

Strides: C2 /4, C3 /8, C4 /16, C5 /32 with channels 256/512/1024/2048.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torch-compatible hyperparameters."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None  # cross-replica sync-BN axis under shard_map

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            axis_name=self.bn_axis,
            name="bn",
        )(x)
        return x


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    features: int  # bottleneck width; output is 4x this
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_axis=self.bn_axis)
        residual = x
        y = ConvBN(self.features, 1, 1, name="a", **kw)(x, train)
        y = nn.relu(y)
        # torch puts the stride on the 3x3 (ResNet v1.5), reproduce that.
        y = ConvBN(self.features, 3, self.stride, name="b", **kw)(y, train)
        y = nn.relu(y)
        y = ConvBN(self.features * 4, 1, 1, name="c", **kw)(y, train)
        if self.project:
            residual = ConvBN(self.features * 4, 1, self.stride, name="proj", **kw)(
                x, train
            )
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet-50 trunk returning (C2, C3, C4, C5)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    bn_axis: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> tuple[jnp.ndarray, ...]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  bn_axis=self.bn_axis)
        x = ConvBN(64, 7, 2, name="stem", **kw)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            stride = 1 if stage == 0 else 2
            x = Bottleneck(
                width, stride=stride, project=True, name=f"layer{stage + 1}_0", **kw
            )(x, train)
            for blk in range(1, blocks):
                x = Bottleneck(width, name=f"layer{stage + 1}_{blk}", **kw)(x, train)
            feats.append(x)
        return tuple(feats)  # C2, C3, C4, C5
