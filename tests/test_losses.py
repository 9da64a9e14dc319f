"""Golden tests: losses vs the torch CPU oracle (SURVEY §4 item 1)."""

import pytest

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from basi_tpu.ops.losses import (
    dice_loss,
    focal_loss,
    sigmoid_bce,
    soft_iou_loss,
)


def test_bce_matches_torch(rng):
    logits = rng.randn(4, 33, 17).astype(np.float32) * 3
    targets = (rng.rand(4, 33, 17) > 0.5).astype(np.float32)
    got = float(sigmoid_bce(jnp.asarray(logits), jnp.asarray(targets)))
    want = float(F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_weighted(rng):
    logits = rng.randn(6, 9).astype(np.float32)
    targets = (rng.rand(6, 9) > 0.5).astype(np.float32)
    w = (rng.rand(6, 9) > 0.3).astype(np.float32)
    got = float(sigmoid_bce(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w)))
    per = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets), reduction="none")
    want = float((per * torch.from_numpy(w)).sum() / w.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dice_zero_for_perfect_prediction(rng):
    t = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
    logits = (t * 2 - 1) * 20.0  # saturated sigmoid -> ~t
    loss = float(dice_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert loss < 1e-3, loss


def test_dice_validity_weighting(rng):
    logits = rng.randn(4, 8, 8).astype(np.float32)
    t = (rng.rand(4, 8, 8) > 0.5).astype(np.float32)
    valid = np.array([1, 1, 0, 0], np.float32)
    got = float(dice_loss(jnp.asarray(logits), jnp.asarray(t), jnp.asarray(valid)))
    want = float(dice_loss(jnp.asarray(logits[:2]), jnp.asarray(t[:2])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_focal_matches_manual(rng):
    logits = rng.randn(5, 7).astype(np.float32)
    t = (rng.rand(5, 7) > 0.8).astype(np.float32)
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(t)))
    # manual torch computation
    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(t)
    p = torch.sigmoid(lt)
    ce = F.binary_cross_entropy_with_logits(lt, tt, reduction="none")
    p_t = p * tt + (1 - p) * (1 - tt)
    alpha_t = 0.25 * tt + 0.75 * (1 - tt)
    want = float((alpha_t * (1 - p_t) ** 2 * ce).sum() / max(t.sum(), 1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_soft_iou_bounds(rng):
    logits = rng.randn(3, 12, 12).astype(np.float32)
    t = (rng.rand(3, 12, 12) > 0.5).astype(np.float32)
    v = float(soft_iou_loss(jnp.asarray(logits), jnp.asarray(t)))
    assert 0.0 <= v <= 1.0


@pytest.mark.slow
def test_sparse_loss_matches_dense():
    """Positive-cells-only instance loss (with_candidates=False path) must
    equal the dense all-cells loss — value AND gradient — whenever every
    positive cell is kept (max_pos_cells >= #positives)."""
    import jax

    from basi_tpu.models.basi import create_model, init_model
    from basi_tpu.train.loss import basi_loss
    from helpers import tiny_batch, tiny_config

    cfg = tiny_config(batch_size=2)
    model = create_model(cfg.model)
    params, bstats = init_model(model, cfg.model.image_size, seed=0)
    rng = np.random.RandomState(0)
    batch = tiny_batch(rng, n=2, size=cfg.model.image_size, m=4)
    imgs = jnp.asarray(batch["image"]).astype(jnp.float32) / 255.0
    gm = jnp.asarray(batch["masks"], jnp.float32)
    gv = jnp.asarray(batch["valid"])

    def loss_with(with_cand):
        def f(p):
            # train=True like the real step: saliency deep-supervision aux
            # must be present in BOTH paths (with_candidates only controls
            # the candidate-mask tensor)
            out, _ = model.apply({"params": p, "batch_stats": bstats}, imgs,
                                 train=True, with_candidates=with_cand,
                                 mutable=["batch_stats"])
            loss, metrics = basi_loss(out, gm, gv, max_pos_cells=64)
            return loss, metrics
        (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, metrics, grads

    dense_loss, dense_m, dense_g = loss_with(True)
    sparse_loss, sparse_m, sparse_g = loss_with(False)
    assert float(dense_m["num_pos_cells"]) > 0
    np.testing.assert_allclose(float(sparse_loss), float(dense_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(float(sparse_m["mask_dice"]),
                               float(dense_m["mask_dice"]), rtol=1e-5)
    np.testing.assert_allclose(float(sparse_m["mask_bce"]),
                               float(dense_m["mask_bce"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(dense_g), jax.tree.leaves(sparse_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
