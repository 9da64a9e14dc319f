"""On-device joint augmentation (SURVEY §2.5): flip + scale jitter.

The reference augments per-sample on the host in DataLoader workers. Here
augmentation runs inside the jitted train step, driven by the step's PRNG
key — deterministic, reproducible, and overlapped with compute:

  * horizontal flip: ``lax.rev`` selected per image (the image path can use
    the fused Pallas normalize+flip kernel; masks flip here in XLA).
  * scale jitter ("zoom"): implemented as a *dynamic* separable bilinear
    resample — per-image (out, in) interpolation weight matrices built from
    traced scale/offset scalars, applied as two einsums. Static shapes, MXU
    work instead of gathers; zoom-out pads with zeros, zoom-in crops at a
    random offset, jointly for image and masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dynamic_interp_matrix(out_size: int, in_size: int,
                          scale: jnp.ndarray, offset: jnp.ndarray) -> jnp.ndarray:
    """(out, in) bilinear sampling matrix for src = (i+0.5)*r + offset - 0.5.

    ``r = in_size_covered / out_size`` is traced (per-image); coords outside
    [0, in) get zero weight (zero padding). Built elementwise on the VPU as
    a banded hat-function matrix: W[i, j] = max(0, 1 - |src_i - j|).
    """
    i = jnp.arange(out_size, dtype=jnp.float32)[:, None]
    j = jnp.arange(in_size, dtype=jnp.float32)[None, :]
    src = (i + 0.5) * scale + offset - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - j))
    # Zero out rows whose sample center is fully outside the source.
    inside = (src > -1.0) & (src < in_size)
    return w * inside


def scale_jitter_one(image: jnp.ndarray, masks: jnp.ndarray,
                     scale: jnp.ndarray, off_y: jnp.ndarray, off_x: jnp.ndarray):
    """Zoom one image (H, W, C) + masks (M, H, W) by traced ``scale``.

    scale > 1 zooms in (random crop of 1/scale of the image, resized back);
    scale < 1 zooms out (image shrinks onto a zero-padded canvas).
    off_y/off_x in [0, 1] choose the crop/placement position.
    """
    h, w, _ = image.shape
    r = 1.0 / scale  # source pixels advanced per output pixel
    # Max offset keeps the sampled window inside the source when zooming in;
    # when zooming out it shifts the placement (negative source start).
    max_off_y = h - r * h
    max_off_x = w - r * w
    oy = off_y * max_off_y
    ox = off_x * max_off_x
    wy = dynamic_interp_matrix(h, h, r, oy)
    wx = dynamic_interp_matrix(w, w, r, ox)

    prec = jax.lax.Precision.HIGHEST
    img = jnp.einsum("oh,hwc->owc", wy, image.astype(jnp.float32), precision=prec)
    img = jnp.einsum("pw,owc->opc", wx, img, precision=prec)

    msk = jnp.einsum("oh,mhw->mow", wy, masks.astype(jnp.float32), precision=prec)
    msk = jnp.einsum("pw,mow->mop", wx, msk, precision=prec)
    msk = (msk > 0.5).astype(masks.dtype)
    return img.astype(image.dtype), msk


def random_augment(rng: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                   hflip_prob: float = 0.5,
                   scale_range: tuple[float, float] = (0.75, 1.25),
                   enable_scale: bool = True):
    """Joint batched augmentation. images (N,H,W,C) float, masks (N,M,H,W).

    Returns (aug_images, aug_masks, flip_flags). Flip is returned so callers
    using the fused Pallas normalize+flip ingest kernel can apply the SAME
    flip there and skip the image flip here (pass images=None semantics are
    not supported; instead use ``flip_only=False`` paths).
    """
    n = images.shape[0]
    k_flip, k_scale, k_oy, k_ox = jax.random.split(rng, 4)
    flip = jax.random.bernoulli(k_flip, hflip_prob, (n,))

    imgs = jnp.where(flip[:, None, None, None], jnp.flip(images, axis=2), images)
    msks = jnp.where(flip[:, None, None, None], jnp.flip(masks, axis=3), masks)

    if enable_scale:
        scale = jax.random.uniform(
            k_scale, (n,), minval=scale_range[0], maxval=scale_range[1]
        )
        off_y = jax.random.uniform(k_oy, (n,))
        off_x = jax.random.uniform(k_ox, (n,))
        imgs, msks = jax.vmap(scale_jitter_one)(imgs, msks, scale, off_y, off_x)
    return imgs, msks, flip


def wants_s2d_feed(model_or_cfg) -> bool:
    """True when the model consumes the host-packed space-to-depth uint8
    feed (``space_to_depth_host`` layout). Single source of truth for the
    predicate shared by infer/serve/benchmark: s2d applies only to the
    ResNet stem — VGG16/19 keep the raw 3-channel input (feeding them a
    12-channel batch would crash at trace time, far from the cause)."""
    return (getattr(model_or_cfg, "stem_mode", "conv7") == "s2d"
            and not getattr(model_or_cfg, "backbone", "").startswith("vgg"))


def space_to_depth_host(imgs: "np.ndarray", block: int = 2):
    """Host-side (numpy) twin of models.resnet.space_to_depth for the uint8
    feed: (N, H, W, C) -> (N, H/b, W/b, b*b*C), identical channel order.

    Packing on the host removes the device-side s2d layout copies entirely
    (round-2 profile: the u8 reorder materialized TWO copies, ~0.63 ms per
    batch-8 at 512^2 = 9% of the inference program); the bytes shipped are
    the same, just pre-arranged in the stem's native format.
    """
    import numpy as np

    n, h, w, c = imgs.shape
    x = imgs.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(x.reshape(n, h // block, w // block,
                                          block * block * c))


def pack_masks_host(masks: "np.ndarray") -> "np.ndarray":
    """Bit-pack binary GT masks along W: (..., H, W) u8 -> (..., H, W/8) u8.

    GT masks are the bulk of the train batch's host->device bytes (batch-16
    at 512^2 with 8 slots = 33 MB of the 45 MB upload; the round-3 e2e
    bench showed relay-attached hosts are UPLOAD-bound). np.packbits
    (big-endian bit order) ships them 8x smaller; unpack_masks is the
    on-device inverse (elementwise shifts, ~free next to the saved
    transfer). Lossless for the binary-mask contract (packs ``> 0``).
    """
    import numpy as np

    return np.packbits(masks > 0, axis=-1)


def unpack_masks(packed: jnp.ndarray, w: int) -> jnp.ndarray:
    """On-device inverse of pack_masks_host: (..., H, W/8) u8 -> (..., H, w)
    u8 in {0, 1}. ``w`` trims np.packbits' zero-padding when w % 8 != 0."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # big-endian bits
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :w]


def maybe_unpack_masks(masks: jnp.ndarray, full_w: int) -> jnp.ndarray:
    """Shape-dispatch: accept GT masks either raw (..., H, full_w) or
    bit-packed (..., H, full_w/8) and return the raw form. Consumers stay
    agnostic to whether the feed packed (data.pack_masks)."""
    if masks.shape[-1] == full_w:
        return masks
    if masks.shape[-1] * 8 == ((full_w + 7) // 8) * 8:
        return unpack_masks(masks, full_w)
    raise ValueError(
        f"GT masks W={masks.shape[-1]} is neither the full width "
        f"{full_w} nor its bit-packed /8 form")


# ITU-R BT.601 luma weights — torchvision's rgb_to_grayscale constants, so
# the numpy pixel-space oracle in tests matches torch ColorJitter exactly.
_LUMA = (0.2989, 0.587, 0.114)


def color_jitter(key: jax.Array, images: jnp.ndarray,
                 mean, std,
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0) -> jnp.ndarray:
    """Per-image brightness/contrast/saturation jitter, applied DIRECTLY on
    the normalized tensor (beyond-reference training aug; the reference has
    only flip/scale — SURVEY §2.5).

    Torch-ColorJitter semantics on [0, 1] pixels — brightness ``p*f``,
    contrast ``mean_gray + (p - mean_gray)*f``, saturation
    ``gray + (p - gray)*f`` with factors ~ U[max(0, 1-x), 1+x], applied in
    that fixed order — are each affine in the pixel value, so they commute
    exactly through the normalize affine ``(p - mean)/std``; this applies
    the algebraically-identical transform post-normalization (tested vs a
    pixel-space numpy oracle) and fuses into the surrounding elementwise
    XLA ops instead of forcing a de-normalize/re-normalize round trip.

    Accepts the raw (N, H, W, 3) layout or the host-packed s2d
    (N, H/2, W/2, 12) layout: the four 3-channel sub-pixel blocks are
    jittered with tiled constants (each packed lane is a real pixel, so
    per-pixel gray and the image-mean gray are computed per block /
    across all blocks respectively — identical to jittering before
    packing, also tested).
    """
    if brightness <= 0 and contrast <= 0 and saturation <= 0:
        return images
    n, _, _, c = images.shape
    if c % 3 != 0:
        raise ValueError(f"color_jitter expects C % 3 == 0 layouts, got {c}")
    reps = c // 3
    f32 = jnp.float32
    m = jnp.tile(jnp.asarray(mean, f32), reps)  # (C,)
    s = jnp.tile(jnp.asarray(std, f32), reps)
    w = jnp.tile(jnp.asarray(_LUMA, f32), reps)  # luma, per packed lane

    def factor(k, strength):
        lo = max(0.0, 1.0 - strength)
        return jax.random.uniform(k, (n, 1, 1, 1), f32,
                                  minval=lo, maxval=1.0 + strength)

    kb, kc, ks = jax.random.split(key, 3)
    x = images.astype(f32)

    # Pixel-space gray per packed lane group: g = sum_c w_c (s_c x_c + m_c),
    # computed per 3-channel block -> (N, H, W, reps).
    def gray(xn):
        px = xn * s + m  # back to pixel space, no materialized copy: fused
        g = (px * w).reshape(*px.shape[:3], reps, 3).sum(-1)
        return g

    if brightness > 0:
        f = factor(kb, brightness)
        # p*f normalized: f*x + (f-1)*m/s
        x = f * x + (f - 1.0) * (m / s)
    if contrast > 0:
        f = factor(kc, contrast)
        # blend toward the image-mean gray (mean over all real pixels =
        # mean over H, W and the packed sub-pixel blocks)
        g0 = gray(x).mean(axis=(1, 2, 3)).reshape(n, 1, 1, 1)
        x = f * x + (1.0 - f) * (g0 - m) / s
    if saturation > 0:
        f = factor(ks, saturation)
        g = jnp.repeat(gray(x), 3, axis=-1)  # per-pixel gray, per lane
        x = f * x + (1.0 - f) * (g - m) / s
    return x.astype(images.dtype)
