"""Model-level tests: output shapes/contracts, determinism, VGG variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from basi_tpu.models.basi import BASINet, init_model


@pytest.mark.parametrize("backbone", ["resnet_tiny", "vgg16"])
def test_forward_shapes(backbone):
    m = BASINet(backbone=backbone, fpn_channels=32, mask_channels=32,
                grid_size=8)
    params, bs = init_model(m, 64)
    out = m.apply({"params": params, "batch_stats": bs},
                  jnp.zeros((2, 64, 64, 3)), False)
    assert out.saliency_logits.shape == (2, 16, 16, 1)
    # aux deep-supervision outputs exist ONLY in training (they feed only
    # the loss; inference skips their convs/resizes entirely)
    assert len(out.saliency_aux) == 0
    out_t, _ = m.apply({"params": params, "batch_stats": bs},
                       jnp.zeros((2, 64, 64, 3)), True,
                       mutable=["batch_stats"])
    assert len(out_t.saliency_aux) == 4
    assert out.cell_scores.shape == (2, 8, 8, 1)
    assert out.cell_kernels.shape == (2, 8, 8, 32)
    assert out.mask_feats.shape == (2, 16, 16, 32)
    assert out.mask_logits.shape == (2, 64, 16, 16)


def test_forward_deterministic(rng):
    m = BASINet(backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
                grid_size=8)
    params, bs = init_model(m, 64, seed=0)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    a = m.apply({"params": params, "batch_stats": bs}, x, False)
    b = m.apply({"params": params, "batch_stats": bs}, x, False)
    np.testing.assert_array_equal(np.asarray(a.mask_logits),
                                  np.asarray(b.mask_logits))


def test_train_mode_updates_batch_stats(rng):
    m = BASINet(backbone="resnet_tiny", fpn_channels=32, mask_channels=32,
                grid_size=8)
    params, bs = init_model(m, 64, seed=0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    _, mut = m.apply({"params": params, "batch_stats": bs}, x, True,
                     mutable=["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(bs),
                        jax.tree.leaves(mut["batch_stats"]))
    )
    assert changed


def test_resnet_depth_variants_structure():
    """resnet101/152 share the resnet50 block/stem modules with torchvision
    stage counts (models.resnet.STAGE_SIZES); structure is checked abstractly
    (jax.eval_shape - no FLOPs) so the deep variants stay fast-tier."""
    from basi_tpu.models.resnet import STAGE_SIZES

    for name in ("resnet18", "resnet34", "resnet101", "resnet152"):
        m = BASINet(backbone=name, fpn_channels=32, mask_channels=32,
                    grid_size=8)
        shapes = jax.eval_shape(
            lambda m=m: m.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               train=False))
        bb = shapes["params"]["backbone"]
        for stage, blocks in enumerate(STAGE_SIZES[name], start=1):
            assert f"layer{stage}_{blocks - 1}" in bb, (name, stage)
            assert f"layer{stage}_{blocks}" not in bb, (name, stage)
        if name in ("resnet18", "resnet34"):
            # BasicBlock: two convs, no expansion (layer4 = 512 wide),
            # and torchvision's identity-shortcut layer1 (no proj).
            assert "c" not in bb["layer4_0"], name
            assert bb["layer4_0"]["b"]["conv"]["kernel"].shape[-1] == 512
            assert "proj" not in bb["layer1_0"], name
            assert "proj" in bb["layer2_0"], name
        else:
            # Bottleneck widths match torchvision (stage 4 -> 2048).
            assert bb["layer4_0"]["c"]["conv"]["kernel"].shape[-1] == 2048


def test_unknown_backbone_rejected():
    with pytest.raises(ValueError, match="unknown backbone"):
        BASINet(backbone="resnet20", fpn_channels=32, mask_channels=32,
                grid_size=8).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
            train=False)
