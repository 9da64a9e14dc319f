"""Space-to-depth stem must be EXACTLY equivalent to the 7x7/2 conv."""

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.models.resnet import (
    ResNet50,
    s2d_stem_kernel,
    space_to_depth,
)


def test_s2d_kernel_conv_equivalence(rng):
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    k7 = jnp.asarray(rng.randn(7, 7, 3, 16).astype(np.float32) * 0.1)

    want = jax.lax.conv_general_dilated(
        x, k7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), s2d_stem_kernel(k7),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_s2d_backbone_matches_conv7(rng):
    """Same params, both stem modes -> identical features."""
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    m7 = ResNet50(stage_sizes=(1, 1, 1, 1), stem_mode="conv7")
    ms = ResNet50(stage_sizes=(1, 1, 1, 1), stem_mode="s2d")
    v = m7.init(jax.random.PRNGKey(0), x, False)
    # identical param trees: s2d reuses the canonical conv7 kernel layout
    out7 = m7.apply(v, x, False)
    outs = ms.apply(v, x, False)
    for a, b in zip(out7, outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
