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


# ---- integer-factor bilinear upsample (ops.pallas.upsample_int) ----

def test_upsample_int_interpret_exact(rng):
    """Interpret mode matches the separable-einsum path BITWISE (identical
    weights, f32 accumulation, one final bf16 round)."""
    import jax.numpy as jnp

    from basi_tpu.ops.pallas.upsample_int import (
        upsample_int,
        upsample_int_reference,
    )

    from basi_tpu.ops.pallas.upsample_int import (
        _upsample_int_impl,
        _upsample_int_impl_hwnc,
    )

    for shape, f in [((2, 8, 8, 8), 2), ((1, 16, 8, 16), 2),
                     ((2, 8, 8, 8), 4), ((1, 4, 4, 8), 8),
                     ((1, 16, 16, 64), 8)]:
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        want = np.asarray(upsample_int_reference(x, f), np.float32)
        got = np.asarray(upsample_int(x, f, True), np.float32)
        np.testing.assert_array_equal(got, want, err_msg=f"{shape} x{f}")
        for impl in (_upsample_int_impl, _upsample_int_impl_hwnc):
            got = np.asarray(impl(x, f, True), np.float32)
            np.testing.assert_array_equal(
                got, want, err_msg=f"{impl.__name__} {shape} x{f}")


def test_upsample_int_grad_is_exact_adjoint(rng):
    """custom_vjp backward == the einsum path's VJP (transposed matrices)."""
    import jax.numpy as jnp

    from basi_tpu.ops.pallas.upsample_int import upsample_int
    from basi_tpu.ops.resize import _resize_einsum

    x = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.bfloat16)
    g = jnp.asarray(rng.randn(1, 16, 16, 8), jnp.bfloat16)
    _, vjp = jax.vjp(lambda v: upsample_int(v, 2, True), x)
    _, vjp_ref = jax.vjp(lambda v: _resize_einsum(v, (16, 16), False), x)
    np.testing.assert_array_equal(
        np.asarray(vjp(g)[0], np.float32),
        np.asarray(vjp_ref(g)[0], np.float32))


def test_upsample_dispatch_guard():
    """The Pallas fast path only claims bf16 NHWC exact-integer-factor
    upsamples; everything else must stay on the einsum path."""
    import jax.numpy as jnp

    from basi_tpu.ops.resize import _use_pallas_upsample

    ok = jnp.zeros((2, 16, 16, 64), jnp.bfloat16)
    assert _use_pallas_upsample(ok, 32, 32, False) in (True, False)  # backend-dependent
    # f32 input, align_corners, non-uniform factor, non-pow2 factor,
    # non-multiple-of-8 channels, downsample: all einsum.
    assert not _use_pallas_upsample(ok.astype(jnp.float32), 32, 32, False)
    assert not _use_pallas_upsample(ok, 32, 32, True)
    assert not _use_pallas_upsample(ok, 32, 64, False)
    assert not _use_pallas_upsample(ok, 48, 48, False)
    assert not _use_pallas_upsample(ok, 8, 8, False)
    bad_c = jnp.zeros((2, 16, 16, 3), jnp.bfloat16)
    assert not _use_pallas_upsample(bad_c, 32, 32, False)


def test_resize_bilinear_pallas_forced_matches_einsum(rng, monkeypatch):
    """Force the kernel path through resize_bilinear's dispatcher (interpret
    mode, CPU) and check the dispatched result equals the einsum path."""
    import jax.numpy as jnp

    from basi_tpu.ops import resize as R
    from basi_tpu.ops.pallas import upsample_int as U

    x = jnp.asarray(rng.randn(2, 12, 8, 16), jnp.bfloat16)
    want = np.asarray(R._resize_einsum(x, (24, 16), False), np.float32)
    monkeypatch.setattr(R, "pallas_upsample", True)
    orig = U._upsample_int_impl.__wrapped__  # unjitted nhwc impl
    monkeypatch.setattr(
        U, "_dispatch",
        lambda v, f, interpret: orig(v, f, True))
    got = np.asarray(R.resize_bilinear(x, (24, 16)), np.float32)
    np.testing.assert_array_equal(got, want)


def test_normalize_and_flip_s2d_packed_interpret(rng):
    """Host-packed s2d ingest: kernel(pack(x)) == pack(kernel(x)) — the
    packed flip (W'-reverse + b sub-column swap) must equal flip-then-pack
    and the period-3 affine must tile across the 12 packed channels."""
    from basi_tpu.models.resnet import space_to_depth

    imgs = (rng.rand(3, 24, 32, 3) * 255).astype(np.uint8)
    flip = np.array([1, 0, 1], np.int32)
    packed = space_to_depth(jnp.asarray(imgs), 2)
    got = np.asarray(normalize_and_flip(
        packed, jnp.asarray(flip), interpret=True))
    want = np.asarray(space_to_depth(normalize_and_flip_reference(
        jnp.asarray(imgs), jnp.asarray(flip)), 2))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_normalize_and_flip_reference_s2d_packed_bitwise(rng):
    """The XLA reference path must satisfy the same pack/flip commutation
    BITWISE (identical float ops, only relayouts differ)."""
    from basi_tpu.models.resnet import space_to_depth

    imgs = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    flip = np.array([1, 1], np.int32)
    got = np.asarray(normalize_and_flip_reference(
        space_to_depth(jnp.asarray(imgs), 2), jnp.asarray(flip)))
    want = np.asarray(space_to_depth(normalize_and_flip_reference(
        jnp.asarray(imgs), jnp.asarray(flip)), 2))
    np.testing.assert_array_equal(got, want)
