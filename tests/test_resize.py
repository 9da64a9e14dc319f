"""Golden-parity tests: resize semantics vs the torch CPU oracle.

SURVEY.md §7 hard part #1 — exact coordinate conventions. Tolerance 1e-5
per-module in f32 (the end-to-end budget is 1e-3).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from basi_tpu.ops.resize import resize_bilinear, upsample2x


def _torch_resize(x_nhwc, out_hw, align_corners):
    t = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    y = F.interpolate(t, size=out_hw, mode="bilinear", align_corners=align_corners)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((37, 53), (74, 106)), ((16, 16), (64, 64)), ((64, 64), (16, 16)),
     ((33, 47), (100, 50)), ((8, 8), (512, 512))],
)
def test_resize_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.rand(2, *in_hw, 5).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    want = _torch_resize(x, out_hw, align_corners)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resize_identity(rng):
    x = rng.rand(1, 13, 17, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (13, 17)))
    np.testing.assert_allclose(got, x, atol=0, rtol=0)


def test_resize_rank_handling(rng):
    x2 = rng.rand(9, 11).astype(np.float32)
    y2 = resize_bilinear(jnp.asarray(x2), (18, 22))
    assert y2.shape == (18, 22)
    x3 = rng.rand(9, 11, 4).astype(np.float32)
    x3[..., 0] = x2  # channel 0 must reproduce the rank-2 result exactly
    y3 = resize_bilinear(jnp.asarray(x3), (18, 22))
    assert y3.shape == (18, 22, 4)
    np.testing.assert_allclose(
        np.asarray(y3[..., 0]), np.asarray(y2), atol=1e-6, rtol=1e-6
    )


def test_upsample2x_matches_torch(rng):
    x = rng.rand(2, 20, 24, 8).astype(np.float32)
    got = np.asarray(upsample2x(jnp.asarray(x)))
    want = _torch_resize(x, (40, 48), False)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_resize_to_one_pixel_align_corners_matches_torch():
    """align_corners=True, out_size=1: torch samples index 0, not the input
    center (the half-pixel fallback gave 1.5 for [0,1,2,3])."""
    import jax.numpy as jnp
    import numpy as np
    import torch
    import torch.nn.functional as F

    from basi_tpu.ops.resize import resize_bilinear

    x = np.arange(4, dtype=np.float32)
    want = F.interpolate(
        torch.tensor(x)[None, None, None, :], size=(1, 1),
        mode="bilinear", align_corners=True)[0, 0].numpy()
    got = np.asarray(resize_bilinear(
        jnp.asarray(x)[None, :, None], (1, 1), align_corners=True))[..., 0]
    np.testing.assert_allclose(got, want, atol=1e-6)
