"""End-to-end smoke (SURVEY §4 item 3): Trainer + Inferencer on synthetic
data — loss decreases, checkpoint round-trips, AP harness runs."""

import dataclasses
import os

import numpy as np
import pytest

from helpers import tiny_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from basi_tpu.train.loop import Trainer

    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, checkpoint_dir=ckpt_dir,
                                  epochs=1),
        parallel=dataclasses.replace(cfg.parallel, num_devices=1),
    )
    # Shrink the synthetic dataset for speed: 3 train batches, 1 val batch.
    trainer = Trainer(cfg)
    trainer.dataset.n = 24
    trainer.val_dataset.n = 8
    trainer.feed.dataset = trainer.dataset
    metrics = trainer.train()
    return cfg, trainer, metrics, ckpt_dir


def test_train_runs_and_logs(trained):
    _, _, metrics, _ = trained
    assert "loss" in metrics and np.isfinite(metrics["loss"])
    assert "AP@0.5" in metrics


def test_checkpoint_roundtrip(trained):
    cfg, trainer, _, ckpt_dir = trained
    from basi_tpu.train.state import create_train_state
    from basi_tpu.utils.checkpoint import CheckpointManager

    import jax

    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() is not None
    template = create_train_state(trainer.model, cfg.model, cfg.train, 10)
    restored = mgr.restore(template)
    # restored step matches trained state's step
    assert int(jax.device_get(restored.step)) == int(
        jax.device_get(trainer.state.step))
    # params equal
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_ap_on_gt_is_perfect(trained):
    """Feeding GT masks as predictions must give AP == 1."""
    cfg, trainer, _, _ = trained
    from basi_tpu.evals.ap import APAccumulator

    acc = APAccumulator()
    rngs = np.random.RandomState(3)
    for _ in range(4):
        m = rngs.randint(1, 4)
        iou = np.eye(m, dtype=np.float64)  # perfect matches
        scores = np.linspace(1, 0.5, m)
        acc.add(scores, iou, np.ones(m))
    ap = acc.ap()
    assert ap["AP@0.5"] == 1.0 and ap["mAP"] == 1.0


def test_resume_continues(trained):
    cfg, trainer, _, ckpt_dir = trained
    from basi_tpu.train.loop import Trainer

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, resume="auto", epochs=1),
    )
    t2 = Trainer(cfg2)
    import jax

    assert int(jax.device_get(t2.state.step)) == int(
        jax.device_get(trainer.state.step))


def test_infer_greedy_nms_config():
    """The greedy-NMS (reference-parity) path must run under the jitted
    inference program too."""
    import dataclasses

    from basi_tpu.infer import Inferencer

    cfg = tiny_config(batch_size=2)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, nms="greedy", batch_size=2))
    inf = Inferencer(cfg)
    rng2 = np.random.RandomState(5)
    imgs = (rng2.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    masks, scores, sal = inf.predict_batch(imgs)
    assert masks.shape[0] == 2 and np.isfinite(np.asarray(scores)).all()
