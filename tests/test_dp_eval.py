"""Data-parallel eval (SURVEY §5.8 / VERDICT r2 item 2): the mesh-sharded
eval program must land on IDENTICAL metrics to the single-device path —
per-image work is batch-parallel, so sharding the batch must not change a
single reduction order within any image."""

import dataclasses

import numpy as np

from basi_tpu.infer import Inferencer
from basi_tpu.parallel.mesh import make_mesh

from helpers import tiny_config


def _timing_stripped(metrics: dict) -> dict:
    return {k: v for k, v in metrics.items()
            if k not in ("infer_ms_per_batch", "imgs_per_s",
                         "png_ms_per_batch")}


def test_dp_eval_matches_single_device():
    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, synthetic_n=48))

    single = Inferencer(cfg)
    m_single = single.evaluate()

    mesh = make_mesh(8, "data")
    dp = Inferencer(cfg, params=single.params,
                    batch_stats=single.batch_stats, mesh=mesh)
    m_dp = dp.evaluate()

    want = _timing_stripped(m_single)
    got = _timing_stripped(m_dp)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=0, rtol=0,
                                   err_msg=k)


def test_dp_eval_rejects_indivisible_batch():
    import pytest

    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, batch_size=6))
    with pytest.raises(ValueError, match="not divisible"):
        Inferencer(cfg, mesh=make_mesh(8, "data"))


def test_iter_epoch_rows_subset_matches_full():
    """Process-sharded decoding: rows=subset must yield exactly the full
    batch's corresponding rows, every batch, including the padded tail."""
    from basi_tpu.data.datasets import SyntheticDataset, iter_epoch

    ds = SyntheticDataset(n=10, image_size=32, max_instances=2)
    rows = np.array([1, 2])
    full = list(iter_epoch(ds, 4, shuffle=True, seed=3, drop_last=False))
    sub = list(iter_epoch(ds, 4, shuffle=True, seed=3, drop_last=False,
                          rows=rows))
    assert len(full) == len(sub)
    for fb, sb in zip(full, sub):
        assert int(fb["num_real"]) == int(sb["num_real"])
        for k in ("image", "masks", "valid", "orig_hw", "valid_hw"):
            np.testing.assert_array_equal(fb[k][rows], sb[k], err_msg=k)


def test_local_rows_and_assembly_roundtrip():
    """make_global_batch_array must reproduce device_put(sharded) exactly
    when one process owns every row (the degenerate single-host case)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from basi_tpu.parallel.dist_data import (
        local_rows,
        make_global_batch_array,
    )

    mesh = make_mesh(8, "data")
    bsh = NamedSharding(mesh, P("data"))
    rows = local_rows(bsh, 16)
    np.testing.assert_array_equal(rows, np.arange(16))
    data = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = make_global_batch_array(data, bsh, 16, rows)
    ref = jax.device_put(data, bsh)
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(ref))
    assert arr.sharding == ref.sharding


def test_dp_eval_with_tta_matches_single_device():
    """TTA composes with the mesh-sharded eval program: views run
    data-parallel under GSPMD and metrics stay bit-identical."""
    cfg = tiny_config(batch_size=8)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, synthetic_n=16),
        infer=dataclasses.replace(cfg.infer, tta="hflip"),
    )
    single = Inferencer(cfg)
    m_single = single.evaluate()
    dp = Inferencer(cfg, params=single.params,
                    batch_stats=single.batch_stats, mesh=make_mesh(8, "data"))
    m_dp = dp.evaluate()
    want, got = _timing_stripped(m_single), _timing_stripped(m_dp)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=0, rtol=0,
                                   err_msg=k)
