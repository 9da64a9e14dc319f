"""Tests: Pallas kernels (interpret mode on CPU) vs XLA reference impls."""

import jax
import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.pallas.normalize_aug import (
    normalize_and_flip,
    normalize_and_flip_reference,
)
from basi_tpu.ops.pallas.upsample_sigmoid import (
    upsample_sigmoid,
    upsample_sigmoid_reference,
)


def test_upsample_sigmoid_interpret(rng):
    x = jnp.asarray(rng.randn(3, 16, 16).astype(np.float32) * 4)
    got = np.asarray(upsample_sigmoid(x, (64, 64), interpret=True))
    want = np.asarray(upsample_sigmoid_reference(x, (64, 64)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample_sigmoid_leading_dims(rng):
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    got = np.asarray(upsample_sigmoid(x, (32, 32), interpret=True))
    assert got.shape == (2, 4, 32, 32)
    want = np.asarray(upsample_sigmoid_reference(x, (32, 32)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_normalize_and_flip_interpret(rng):
    imgs = (rng.rand(4, 24, 32, 3) * 255).astype(np.uint8)
    flip = np.array([0, 1, 0, 1], np.int32)
    got = np.asarray(normalize_and_flip(
        jnp.asarray(imgs), jnp.asarray(flip), interpret=True))
    want = np.asarray(normalize_and_flip_reference(
        jnp.asarray(imgs), jnp.asarray(flip)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample_sigmoid_reference_bf16_matches_kernel_numerics():
    """bf16 inputs: the XLA reference must use the kernel's f32/HIGHEST
    interpolation and out_dtype, not resize_bilinear's bf16 DEFAULT path
    (~2.4e-3 error) — eval output must not depend on the backend."""
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.pallas.upsample_sigmoid import (
        upsample_sigmoid,
        upsample_sigmoid_reference,
    )

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 16, 16).astype(np.float32) * 3,
                         jnp.bfloat16)
    ref = upsample_sigmoid_reference(logits, (64, 64))
    assert ref.dtype == jnp.float32
    got = upsample_sigmoid(logits, (64, 64), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_upsample_sigmoid_identity_size_short_circuits():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.pallas.upsample_sigmoid import upsample_sigmoid

    x = jnp.asarray(np.random.RandomState(1).randn(3, 8, 8), jnp.float32)
    out = upsample_sigmoid(x, (8, 8), interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jax.nn.sigmoid(x)), atol=1e-7)


def test_make_mesh_rejects_inconsistent_spatial_config():
    import pytest

    from basi_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="inconsistent spatial"):
        make_mesh(8, "data", spatial_axis="spatial", spatial_shards=1)
    with pytest.raises(ValueError, match="inconsistent spatial"):
        make_mesh(8, "data", spatial_axis="", spatial_shards=4)
