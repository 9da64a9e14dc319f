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


def test_pre_s2d_input_matches_internal(rng):
    """Feeding an already-s2d input (ingest fast path, C=12) must equal
    feeding the raw image (internal s2d, C=3) with the same params."""
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    ms = ResNet50(stage_sizes=(1, 1, 1, 1), stem_mode="s2d")
    v = ms.init(jax.random.PRNGKey(0), x, False)
    out_raw = ms.apply(v, x, False)
    out_pre = ms.apply(v, space_to_depth(x, 2), False)
    for a, b in zip(out_raw, out_pre):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_inferencer_s2d_matches_conv7(rng):
    """End-to-end: Inferencer with stem_mode=s2d (ingest s2d on uint8) must
    reproduce the conv7 Inferencer's masks/scores with shared params."""
    from basi_tpu.config import get_config
    from basi_tpu.infer import Inferencer
    from basi_tpu.models.basi import create_model, init_model

    overrides = [
        "model.backbone=resnet_tiny", "model.image_size=64",
        "data.image_size=64", "infer.batch_size=2", "infer.dtype=float32",
        "data.dataset=synthetic",
    ]
    cfg7 = get_config("val_v4-8_ap", overrides + ["model.stem_mode=conv7"])
    cfgs = get_config("val_v4-8_ap", overrides + ["model.stem_mode=s2d"])
    m7 = create_model(cfg7.model)
    params, bstats = init_model(m7, 64, seed=0)
    inf7 = Inferencer(cfg7, params=params, batch_stats=bstats)
    infs = Inferencer(cfgs, params=params, batch_stats=bstats)
    img = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    m_a, s_a, sal_a = inf7.predict_batch(img)
    m_b, s_b, sal_b = infs.predict_batch(img)
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sal_a), np.asarray(sal_b),
                               atol=1e-5, rtol=1e-4)


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


def test_host_packed_feed_matches_raw(rng):
    """Pre-packing s2d on the host (the zero-copy feed format) must produce
    bitwise the same predictions as feeding raw NHWC uint8."""
    from basi_tpu.config import get_config
    from basi_tpu.data.transforms import space_to_depth_host
    from basi_tpu.infer import Inferencer
    from basi_tpu.models.basi import create_model, init_model

    cfg = get_config("val_v4-8_ap", [
        "model.backbone=resnet_tiny", "model.image_size=64",
        "data.image_size=64", "infer.batch_size=2", "infer.dtype=float32",
        "data.dataset=synthetic", "model.stem_mode=s2d",
    ])
    model = create_model(cfg.model)
    params, bstats = init_model(model, 64, seed=0)
    inf = Inferencer(cfg, params=params, batch_stats=bstats)
    img = (rng.rand(2, 64, 64, 3) * 255).astype(np.uint8)

    # host packing == device space_to_depth on the same bytes
    np.testing.assert_array_equal(
        space_to_depth_host(img), np.asarray(space_to_depth(jnp.asarray(img))))

    m_raw, s_raw, sal_raw = inf.predict_batch(img)
    m_pk, s_pk, sal_pk = inf.predict_batch(space_to_depth_host(img))
    np.testing.assert_array_equal(np.asarray(s_raw), np.asarray(s_pk))
    np.testing.assert_array_equal(np.asarray(m_raw), np.asarray(m_pk))
    np.testing.assert_array_equal(np.asarray(sal_raw), np.asarray(sal_pk))


def test_conv7p8_stem_forward_and_grad_parity(rng):
    """The channel-padded stem (stem_mode=conv7p8): same params, same
    forward as conv7 (zero channels contribute 0; the wider contraction
    may reassociate the reduction, so allclose not bitwise), and the
    (7,7,3,64) kernel gradient equal to the plain conv's (the dW on the
    padded kernel slices back through the pad transpose)."""
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    m7 = ResNet50(stage_sizes=(1, 1, 1, 1), stem_mode="conv7")
    mp = ResNet50(stage_sizes=(1, 1, 1, 1), stem_mode="conv7p8")
    v = m7.init(jax.random.PRNGKey(0), x, False)
    out7 = m7.apply(v, x, False)
    outp = mp.apply(v, x, False)
    for a, b in zip(out7, outp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # Gradient parity at the stem itself with a well-conditioned loss
    # (tanh * random weights). Comparing deep-net gradients THROUGH the
    # train-mode BN stack is chaotic: conv+BN weight gradients live in
    # near-cancelling scale-invariant subspaces, so the 1e-6 forward
    # reassociation noise amplifies arbitrarily. The padded dW's slice
    # transpose is what this pins.
    k7p = v["params"]["stem"]["conv"]["kernel"]
    w = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))

    def conv7(k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv7p8(k):
        kp_ = jnp.pad(k, ((0, 0), (0, 0), (0, 5), (0, 0)))
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 5)))
        return jax.lax.conv_general_dilated(
            xp, kp_, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    g7 = jax.grad(lambda k: jnp.sum(jnp.tanh(conv7(k)) * w))(k7p)
    gp = jax.grad(lambda k: jnp.sum(jnp.tanh(conv7p8(k)) * w))(k7p)
    assert np.asarray(gp).shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(gp)), float(jnp.linalg.norm(g7)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(g7),
                               rtol=1e-2, atol=1e-3)
