"""END-TO-END golden parity: full torch BASINet -> flax BASINet.

The north-star parity target is <=1e-3 per-pixel on output maps
(BASELINE.md); per-module fp32 tolerance here is tighter. This exercises
every conversion rule at once: conv transposes, BN eval semantics, GN
grouping, CoordConv channel order, FPN resize convention, and the
dynamic-kernel einsum ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from basi_tpu.convert.full_import import import_basinet
from basi_tpu.models.basi import BASINet

from torch_basi import TorchBASINet


def test_full_model_conversion_matches_torch(rng):
    stage_sizes = (1, 1, 1, 1)
    tmodel = TorchBASINet(stage_sizes=stage_sizes, fpn_ch=256, mask_ch=64,
                          grid=8).eval()
    # non-trivial BN stats
    g = torch.Generator().manual_seed(0)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = import_basinet(sd, stage_sizes)

    jmodel = BASINet(backbone="resnet_tiny", fpn_channels=256,
                     mask_channels=64, grid_size=8)

    # structure check vs init
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), False)
    assert (jax.tree.structure(params)
            == jax.tree.structure(variables["params"]))

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), False)

    np.testing.assert_allclose(
        np.asarray(got.saliency_logits)[..., 0],
        want["saliency"][:, 0].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.cell_scores)[..., 0],
        want["cell_scores"][:, 0].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.mask_logits),
        want["mask_logits"].numpy(), atol=2e-3, rtol=2e-3)
    for j_aux, t_aux in zip(got.saliency_aux, want["saliency_aux"]):
        np.testing.assert_allclose(
            np.asarray(j_aux)[..., 0], t_aux[:, 0].numpy(),
            atol=1e-3, rtol=1e-3)


def test_full_model_conversion_matches_torch_vgg16(rng):
    """The reference's VGG16 option (SURVEY §2.6) through the FULL
    importer: torchvision features.* indices map onto the flax trunk, and
    classic VGG16 carries no BatchNorm, so batch_stats come back empty."""
    tmodel = TorchBASINet(fpn_ch=64, mask_ch=32, grid=8,
                          backbone="vgg16").eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = import_basinet(sd, backbone="vgg16")
    assert stats == {}

    jmodel = BASINet(backbone="vgg16", fpn_channels=64,
                     mask_channels=32, grid_size=8)
    variables = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), False)
    assert (jax.tree.structure(params)
            == jax.tree.structure(variables["params"]))
    assert "batch_stats" not in variables

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply({"params": params}, jnp.asarray(x), False)

    np.testing.assert_allclose(
        np.asarray(got.saliency_logits)[..., 0],
        want["saliency"][:, 0].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.cell_scores)[..., 0],
        want["cell_scores"][:, 0].numpy(), atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got.mask_logits),
        want["mask_logits"].numpy(), atol=2e-3, rtol=2e-3)
