"""MetricLogger: JSONL records + optional TensorBoard scalar stream."""

import glob
import json
import os

from basi_tpu.utils.logging import MetricLogger


def test_jsonl_records(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricLogger(path, console=False)
    lg.log({"step": 1, "loss": 0.5})
    lg.log({"step": 2, "loss": 0.25, "note": "x"})
    lg.close()
    recs = [json.loads(line) for line in open(path)]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["note"] == "x"
    assert all("t" in r for r in recs)


def test_tensorboard_scalars(tmp_path):
    tb_dir = str(tmp_path / "tb")
    lg = MetricLogger("", console=False, tensorboard_dir=tb_dir)
    lg.log({"step": 3, "loss": 0.125, "lr": 0.01, "name": "skipme"},
           prefix="[train]")
    lg.close()
    events = glob.glob(os.path.join(tb_dir, "events.out.tfevents.*"))
    assert events, "no TB event file written"
    assert os.path.getsize(events[0]) > 0
    # scalars round-trip through the event file
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"train/loss", "train/lr"} <= tags
    ev = acc.Scalars("train/loss")[0]
    assert ev.step == 3 and abs(ev.value - 0.125) < 1e-9


def test_tensorboard_failure_disables_not_raises(tmp_path):
    """A writer that starts failing mid-run (full/unwritable volume) must
    degrade to a one-time warning, not abort training."""
    import warnings

    lg = MetricLogger("", console=False,
                      tensorboard_dir=str(tmp_path / "tb"))

    class Boom:
        def add_scalar(self, *a, **k):
            raise OSError("disk full")

        def close(self):
            pass

    lg._tb = Boom()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        lg.log({"step": 1, "loss": 1.0}, prefix="[train]")  # must not raise
    assert any("tensorboard" in str(x.message) for x in w)
    assert lg._tb is None  # disabled after first failure
    lg.log({"step": 2, "loss": 0.5}, prefix="[train]")  # still fine
    lg.close()


def test_metric_logger_close_idempotent(tmp_path):
    lg = MetricLogger(str(tmp_path / "m.jsonl"), console=False)
    lg.log({"step": 1, "loss": 1.0})
    lg.close()
    lg.close()  # second close is a no-op
    lg.log({"step": 2, "loss": 0.5})  # post-close logging degrades quietly
