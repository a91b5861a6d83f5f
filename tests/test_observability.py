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


class TestProgressPanels:
    def test_frame_quality_and_panel(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from vtgaussian_slam_tpu.core.losses import Frame, RenderResult
        from vtgaussian_slam_tpu.utils.observability import (
            frame_quality, save_progress_panel)

        H, W = 24, 32
        rng = np.random.default_rng(0)
        im = jnp.asarray(rng.random((3, H, W)).astype(np.float32))
        depth = jnp.asarray(rng.random((1, H, W)).astype(np.float32) + 1.0)
        r = RenderResult(im=im, depth=depth,
                         silhouette=jnp.ones((H, W), jnp.float32),
                         depth_sq=depth * depth,
                         radii=jnp.ones((4,), jnp.float32))
        frame = Frame(color=im, depth=depth)  # identical -> perfect scores
        psnr, rmse, l1, mask = frame_quality(r, frame, 0.5)
        assert psnr > 60 and rmse < 1e-5 and l1 < 1e-5
        assert mask.all()

        out = tmp_path / "plots" / "frame_00001.png"
        save_progress_panel(str(out), r, frame, 0.5, title="t")
        assert out.exists() and out.stat().st_size > 1000
