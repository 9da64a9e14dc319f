"""Paste tests: letterboxed mask -> original-resolution canvas."""

import jax.numpy as jnp
import numpy as np

from basi_tpu.ops.paste import paste_mask, paste_masks_batch


def test_paste_identity_when_full():
    m = np.zeros((16, 16), np.float32)
    m[4:12, 4:12] = 1.0
    out = paste_mask(jnp.asarray(m), jnp.asarray([16, 16]), (16, 16),
                     jnp.asarray([16, 16]))
    np.testing.assert_allclose(np.asarray(out), m, atol=1e-5)


def test_paste_upscales_letterboxed_content():
    # content occupies top-left 8x16 of a 16x16 letterbox (orig 40x80)
    m = np.zeros((16, 16), np.float32)
    m[0:8, :] = 1.0  # full valid region on
    out = np.asarray(paste_mask(jnp.asarray(m), jnp.asarray([8, 16]),
                                (64, 96), jnp.asarray([40, 80])))
    # inside the original extent: ~1; outside: 0
    assert out[:40, :80].mean() > 0.95
    assert out[40:, :].max() == 0.0
    assert out[:, 80:].max() == 0.0


def test_paste_batch_shapes():
    masks = np.random.RandomState(0).rand(2, 3, 16, 16).astype(np.float32)
    out = paste_masks_batch(
        jnp.asarray(masks),
        jnp.asarray([[16, 16], [8, 16]]),
        (32, 32),
        jnp.asarray([[32, 32], [16, 32]]),
    )
    assert out.shape == (2, 3, 32, 32)


def test_paste_does_not_bleed_letterbox_padding():
    """Bilinear taps must clamp to the valid letterbox region: the old
    h-1/w-1 clamp blended the model's padding-area predictions into the
    bottom/right border rows (0.625 instead of 0.5 here)."""
    import jax.numpy as jnp
    import numpy as np

    from basi_tpu.ops.paste import paste_mask

    mask = np.full((8, 8), 1.0, np.float32)  # padding area = 1.0
    mask[:6, :] = 0.5                        # valid content = 0.5
    out = np.asarray(paste_mask(
        jnp.asarray(mask), jnp.asarray([6, 8]), (16, 16),
        jnp.asarray([12, 16])))
    content = out[:12, :16]
    np.testing.assert_allclose(content, 0.5, atol=1e-6)
    np.testing.assert_allclose(out[12:, :], 0.0, atol=1e-6)
