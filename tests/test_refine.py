"""BASNet-style residual refinement module (model.refine): forward
semantics, train integration, and the full torch-interop circle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from basi_tpu.convert.full_import import import_basinet
from basi_tpu.convert.torch_export import export_basinet
from basi_tpu.models.basi import BASINet

from helpers import tiny_batch, tiny_config
from torch_basi import TorchBASINet

STAGE = (1, 1, 1, 1)


def _models(seed=0):
    jmodel = BASINet(backbone="resnet_tiny", fpn_channels=64,
                     mask_channels=32, grid_size=8, refine=True)
    variables = jmodel.init(jax.random.PRNGKey(seed),
                            jnp.zeros((1, 64, 64, 3)), False)
    stats = jax.tree.map(lambda x: x + 0.05, variables["batch_stats"])
    return jmodel, variables["params"], stats


def test_refine_near_identity_at_init_and_aux_grows(rng):
    jmodel, params, stats = _models()
    base = BASINet(backbone="resnet_tiny", fpn_channels=64,
                   mask_channels=32, grid_size=8, refine=False)
    # Same seed -> identical shared params; refine adds its own subtree.
    bparams = base.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), False)["params"]
    assert "refine" in params and "refine" not in bparams

    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    out = jmodel.apply({"params": params, "batch_stats": stats}, x, False)
    # The residual conv is near-zero-init: refined ~= coarse (logit scale).
    bout = base.apply(
        {"params": {k: v for k, v in params.items() if k != "refine"},
         "batch_stats": stats}, x, False)
    delta = np.abs(np.asarray(out.saliency_logits)
                   - np.asarray(bout.saliency_logits))
    assert delta.max() < 0.2, delta.max()
    assert delta.max() > 0  # the RRM is actually in the graph

    # Training: the coarse map joins the deep-supervision aux list.
    out_t = jmodel.apply({"params": params, "batch_stats": stats}, x, True,
                         mutable=["batch_stats"])[0]
    bout_t = base.apply(
        {"params": {k: v for k, v in params.items() if k != "refine"},
         "batch_stats": stats}, x, True, mutable=["batch_stats"])[0]
    assert len(out_t.saliency_aux) == len(bout_t.saliency_aux) + 1


def test_refine_train_step_runs_and_learns():
    cfg = tiny_config(batch_size=4)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, refine=True))
    from basi_tpu.models.basi import create_model
    from basi_tpu.train.state import create_train_state, make_optimizer
    from basi_tpu.train.step import make_train_step

    model = create_model(cfg.model)
    assert model.refine
    tx, _ = make_optimizer(cfg.train, max_steps=8)
    state = create_train_state(model, cfg.model, cfg.train, max_steps=8)
    step = make_train_step(model, tx, cfg.train, cfg.data, mesh=None,
                           donate=False)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng, 4, 64).items()}
    losses = []
    for _ in range(6):
        state, metrics = step.body(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learns on the repeated batch


def test_refine_full_torch_interop_circle(rng):
    """export -> strict torch load -> forward parity -> import -> bitwise."""
    jmodel, params, stats = _models(seed=1)
    sd = export_basinet(jax.device_get(params), jax.device_get(stats), STAGE)
    tmodel = TorchBASINet(stage_sizes=STAGE, fpn_ch=64, mask_ch=32, grid=8,
                          refine=True).eval()
    tmodel.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        strict=True)

    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jmodel.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(got.saliency_logits)[..., 0],
        want["saliency"][:, 0].numpy(), atol=1e-3, rtol=1e-3)

    p2, s2 = import_basinet(sd, STAGE)
    assert jax.tree.structure(p2) == jax.tree.structure(
        jax.device_get(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refine_inference_end_to_end():
    from basi_tpu.infer import Inferencer

    cfg = tiny_config(batch_size=2)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, refine=True),
        infer=dataclasses.replace(cfg.infer, batch_size=2),
    )
    inf = Inferencer(cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray((rng.rand(2, 64, 64, 3) * 255).astype(np.uint8))
    masks, scores, sal = jax.device_get(
        inf.run_fn(inf.params, inf.batch_stats, imgs))
    assert masks.shape == (2, cfg.model.num_slots, 16, 16)
    assert np.isfinite(sal).all()
