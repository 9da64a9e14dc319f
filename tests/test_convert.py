"""Golden tests: torch->JAX backbone conversion reproduces the torch CPU
oracle end to end (SURVEY §7 hard part #5: BN stats, padding conventions,
NCHW->NHWC — silent errors here surface only as AP drift)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from basi_tpu.convert.torch_import import (
    import_resnet50_backbone,
    import_vgg16_backbone,
)
from basi_tpu.models.resnet import ResNet50
from basi_tpu.models.vgg import VGG16

from torch_ref import ResNet50Trunk, VGG16Features


def _randomize_bn_stats(model):
    """Give BN non-trivial running stats so eval-mode conversion is tested."""
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_resnet50_tiny_conversion_matches_torch(rng):
    stage_sizes = (1, 1, 1, 1)  # tiny for CPU speed; same code path as (3,4,6,3)
    tmodel = ResNet50Trunk(stage_sizes).eval()
    _randomize_bn_stats(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    params, stats = import_resnet50_backbone(sd, stage_sizes)
    jmodel = ResNet50(stage_sizes=stage_sizes)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3,
                                   err_msg=f"C{i + 2}")


def test_converted_structure_matches_init(rng):
    stage_sizes = (1, 1, 1, 1)
    tmodel = ResNet50Trunk(stage_sizes)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = import_resnet50_backbone(sd, stage_sizes)

    jmodel = ResNet50(stage_sizes=stage_sizes)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), False)
    want_p = jax.tree.structure(variables["params"])
    want_s = jax.tree.structure(variables["batch_stats"])
    assert jax.tree.structure(params) == want_p
    assert jax.tree.structure(stats) == want_s
    # shapes too
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(variables["params"])):
        assert a.shape == b.shape


def test_vgg16_conversion_matches_torch(rng):
    tmodel = VGG16Features().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, _ = import_vgg16_backbone(sd)
    jmodel = VGG16()

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply({"params": params}, jnp.asarray(x), False)
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {i}")


def test_resnet18_style_conversion_matches_torch(rng):
    """BasicBlock trunk (resnet18/34 family): import parity vs the torch
    oracle and export roundtrip. (1,1,1,1) stages exercise the identical
    code path as torchvision's (2,2,2,2)/(3,4,6,3) at CPU-test cost."""
    from torch_ref import BasicBlock

    stage_sizes = (1, 1, 1, 1)
    tmodel = ResNet50Trunk(stage_sizes, block=BasicBlock).eval()
    _randomize_bn_stats(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    params, stats = import_resnet50_backbone(sd, stage_sizes)
    jmodel = ResNet50(stage_sizes=stage_sizes, block="basic")

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), False
    )
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3,
                                   err_msg=f"C{i + 2}")
    # channel widths are the un-expanded BasicBlock ones
    assert tuple(g.shape[-1] for g in got) == (64, 128, 256, 512)

    # structure matches a fresh flax init (importer built the right tree)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), False)
    assert jax.tree.structure(params) == jax.tree.structure(
        variables["params"])

    # export is the exact inverse (bitwise, both directions)
    from basi_tpu.convert.torch_export import export_resnet50_backbone

    back = export_resnet50_backbone(params, stats, stage_sizes)
    assert set(back) == set(sd)
    for k in back:
        if "num_batches_tracked" in k:
            continue  # exporter synthesizes these (strict-load filler)
        np.testing.assert_array_equal(np.asarray(back[k]), sd[k], err_msg=k)


def test_vgg_layout_reproduces_torchvision_indices():
    """vgg_layout is the programmatic source of the historical hardcoded
    table: torchvision vgg16 conv indices 0,2/5,7/10,12,14/17,19,21/
    24,26,28 and the documented vgg19 indices."""
    from basi_tpu.convert.torch_import import vgg_layout

    assert [i for i, _ in vgg_layout((2, 2, 3, 3, 3))] == [
        0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    v19 = vgg_layout((2, 2, 4, 4, 4))
    assert [i for i, _ in v19] == [
        0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    assert v19[-1][1] == "conv5_4"


def test_vgg19_conversion_matches_torch(rng):
    from basi_tpu.models.vgg import VGG_DEPTHS

    tmodel = VGG16Features(VGG_DEPTHS["vgg19"]).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, _ = import_vgg16_backbone(sd, VGG_DEPTHS["vgg19"])
    jmodel = VGG16(depths=VGG_DEPTHS["vgg19"])

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply({"params": params}, jnp.asarray(x), False)
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-4, rtol=1e-3,
                                   err_msg=f"level {i}")


def test_vgg19_export_roundtrip(rng):
    """export(import(sd)) is bitwise the original torch state_dict."""
    from basi_tpu.convert.torch_export import export_vgg16_backbone
    from basi_tpu.models.vgg import VGG_DEPTHS

    tmodel = VGG16Features(VGG_DEPTHS["vgg19"]).eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, _ = import_vgg16_backbone(sd, VGG_DEPTHS["vgg19"])
    back = export_vgg16_backbone(params, VGG_DEPTHS["vgg19"])
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
