"""RunLogger JSONL fallback + report helpers (wandb absent in this image)."""
import json

import numpy as np

from vtgaussian_slam_tpu.utils.observability import (RunLogger, report_loss,
                                                     report_progress)


def test_jsonl_fallback(tmp_path):
    lg = RunLogger(True, project="p", group="g", name="n",
                   out_dir=str(tmp_path))
    step = report_loss({"loss": 1.5, "im": 1.0, "depth": 0.5}, lg, 0,
                       tracking=True)
    assert step == 1
    report_progress(lg, 3, np.eye(4), [np.eye(4)] * 5)
    lg.finish()
    lines = [json.loads(l) for l in
             (tmp_path / "events.jsonl").read_text().splitlines()]
    assert lines[0]["event"] == "init"
    assert lines[1]["Per Iteration Tracking/Loss"] == 1.5
    assert any("Tracking/step" in l for l in lines[2:])


def test_disabled_logger_noop(tmp_path):
    lg = RunLogger(False, out_dir=str(tmp_path))
    lg.log({"x": 1})
    lg.finish()
    assert not (tmp_path / "events.jsonl").exists()
