"""Engine-level tests: validation runner, checkpoint/resume, streaming drift."""

import os

import pyspark.sql.functions as F
import pytest

from anomaly_detector_spark.data import synth_registry, synth_transcripts
from anomaly_detector_spark.engine.checkpoint import CheckpointStore
from anomaly_detector_spark.engine.runner import run_validation


@pytest.fixture(scope="module")
def validation(spark):
    transcripts = synth_transcripts(spark, n_convs=150, seed=42).cache()
    registry = synth_registry(spark, n_convs=150, seed=42).cache()
    return run_validation(spark, transcripts, registry, cache_input=True)


def test_verdicts_cover_all_checks(validation):
    checks = {r["check"] for r in validation.verdicts.collect()}
    assert {"uniqueness", "monotonic_ts", "role_domain", "tool_domain",
            "null_text", "referential", "turn_gaps", "sr_drift"} <= checks


def test_violations_ordered_and_typed(validation):
    rows = validation.violations.collect()
    assert len(rows) > 0
    # stable (check, conv_id, turn_idx) ordering
    keys = [(r["check"], r["conv_id"] or "", r["turn_idx"] if r["turn_idx"] is not None else -1)
            for r in rows]
    assert keys == sorted(keys)


def test_planted_checks_fail_clean_checks_pass(validation):
    verd = {r["check"]: r["passed"] for r in validation.verdicts.collect()
            if r["partition_key"] == "_global"}
    assert verd["uniqueness"] is False      # planted dups
    assert verd["role_domain"] is False     # planted 'robot'
    assert verd["referential"] is False     # planted unregistered convs
    assert verd["turn_gaps"] is True        # generator emits contiguous turns


def test_checkpoint_resume(spark, validation, tmp_path):
    store = CheckpointStore(spark, str(tmp_path))
    verdicts = validation.verdicts.cache()
    store.record("run1", verdicts.limit(3))
    all_parts = verdicts.select("partition_key", "check").distinct()
    done_checks = [r["check"] for r in verdicts.limit(3).collect()]
    first_check = done_checks[0]
    parts_for_check = verdicts.filter(F.col("check") == first_check).select("partition_key")
    pending = store.pending(parts_for_check, first_check)
    assert pending.count() < parts_for_check.count() or parts_for_check.count() == 0
    store.record_metrics("run1", {"wall_s": 1.0})
    assert spark.read.parquet(os.path.join(str(tmp_path), "_metrics")).count() == 1


def test_streaming_drift_scores(spark, tmp_path):
    """Exercise the stateful latest-mode scorer through a memory-rate stream
    substitute: run the same applyInPandasWithState function on a static
    micro-batch via the batch API equivalence."""
    import pandas as pd

    from anomaly_detector_spark.streaming.drift_stream import STREAM_SCORE_SCHEMA, _score_latest

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    pdf = pd.DataFrame(
        {
            "series_key": ["a"] * 30,
            "bucket_ts": pd.date_range("2025-01-01", periods=30, freq="h"),
            "value": [10.0] * 29 + [100.0],
        }
    )
    state = FakeState()
    out = list(_score_latest(("a",), iter([pdf]), state))[0]
    assert len(out) == 30
    assert bool(out.iloc[-1]["is_anomaly"])  # planted final spike flagged
    assert out["n_state_points"].iloc[-1] == 30
