"""Checkpoint inspection tooling + metrics emitter tests."""

from __future__ import annotations

import io
import json

from transporter_spark.plans.events import MetricsEmitter, attach_streaming_metrics
from transporter_spark.tools import checkpoint_state, list_offsets
from transporter_spark.streaming.sources import stream_table


def test_metrics_emitter_event_shapes():
    buf = io.StringIO()
    em = MetricsEmitter(sink=buf)
    em.boot({"source": "file:///x"})
    em.metrics("pipe/source", 123)
    em.error("pipe/sink", "boom")
    em.exit()
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert [e["event"] for e in lines] == ["boot", "metrics", "error", "exit"]
    assert lines[1]["records"] == 123


def test_checkpoint_inspection_after_stream(spark, sf_dir, tmp_path):
    """Run a checkpointed query, then read its offsets/commits like
    `transporter xlog current|oldest` + `offset list` would."""
    ckpt = str(tmp_path / "ckpt")
    em = MetricsEmitter(sink=None)
    listener = attach_streaming_metrics(spark, em)
    try:
        q = (
            stream_table(spark, sf_dir, "nation")
            .writeStream.format("memory")
            .queryName("ckpt_inspect")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener callbacks are delivered asynchronously
        import time

        for _ in range(40):
            if any(e["event"] == "metrics" for e in em.events):
                break
            time.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)

    state = checkpoint_state(ckpt)
    assert state["current_batch"] is not None
    assert state["committed_batch"] == state["current_batch"]
    assert state["uncommitted"] == []
    offsets = list_offsets(ckpt)
    assert len(offsets) >= 1 and offsets[0]["batch"] == 0
    # listener captured boot + progress metrics for the query
    kinds = [e["event"] for e in em.events]
    assert "boot" in kinds and "metrics" in kinds
