"""Observability helpers: MetricsLogger JSONL/TB stream, StepTimer,
profile_trace no-op behavior."""

from __future__ import annotations

import json
import os

from gpt2_image_captioning_tpu.core.logging import (
    MetricsLogger,
    StepTimer,
    profile_trace,
)


def test_metrics_logger_jsonl_stream(tmp_path):
    log_dir = str(tmp_path / "logs")
    ml = MetricsLogger(log_dir)
    ml.add_scalar("loss", 1.5, 0)
    ml.add_scalars({"cider": 0.9, "bleu4": 0.3}, 1)
    ml.close()
    lines = [
        json.loads(line)
        for line in open(os.path.join(log_dir, "metrics.jsonl"))
    ]
    assert {"tag": "loss", "value": 1.5, "step": 0} in lines
    tags = {line["tag"] for line in lines}
    assert {"loss", "cider", "bleu4"} <= tags
    # steps recorded as ints
    assert all(isinstance(line["step"], int) for line in lines)


def test_metrics_logger_appends_across_instances(tmp_path):
    log_dir = str(tmp_path / "logs")
    a = MetricsLogger(log_dir)
    a.add_scalar("x", 1.0, 0)
    a.close()
    b = MetricsLogger(log_dir)
    b.add_scalar("x", 2.0, 1)
    b.close()
    lines = list(open(os.path.join(log_dir, "metrics.jsonl")))
    assert len(lines) == 2  # append-only, resume-friendly


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop()
    s = t.summary(skip_warmup=1)
    assert s["steps"] == 3
    assert s["min_s"] <= s["mean_s"] <= s["max_s"]
    assert StepTimer().summary() == {"steps": 0}


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        x = 1 + 1
    assert x == 2
