"""Checkpoint-upgrade failure mode for the stateful streaming scorer.

drift_stream.py documents (module docstring) that checkpoints written under
the legacy 3-field close-on-advance state layout CANNOT be decoded by the
current 4-field ``_STATE_SCHEMA`` — the upgrade contract is a HARD error at
restart, never a silent mis-decode that would corrupt scores.  This test
builds a checkpoint with the legacy layout, restarts the same
checkpointLocation with the current operator, and asserts Spark's state
schema check rejects it loudly (no output rows emitted from the restart).
"""

import pandas as pd
import pytest
from pyspark.errors.exceptions.base import PySparkException
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.utils import StreamingQueryException

from anomaly_detector_spark.streaming.drift_stream import (
    STREAM_SCORE_SCHEMA,
    bucketed_events,
    score_stream,
)

# the pre-upgrade close-on-advance state layout (3 fields)
_LEGACY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("values", T.ArrayType(T.DoubleType()), True),
        T.StructField("last_epoch", T.LongType(), True),
        T.StructField("n_closed", T.LongType(), True),
    ]
)


def _write_stream_file(spark, path, h_lo, h_hi):
    t0 = pd.Timestamp("2025-01-01")
    rows = [("click", t0 + pd.Timedelta(hours=h, seconds=i))
            for h in range(h_lo, h_hi) for i in range(5)]
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(path))


def test_legacy_state_checkpoint_fails_loudly_on_upgrade(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_stream_file(spark, src / "f1", 0, 20)
    ckpt = str(tmp_path / "ckpt")

    def read_events():
        stream = (
            spark.readStream.schema("event_type string, ts timestamp")
            .parquet(str(src / "*"))
        )
        return bucketed_events(stream, partition_cols=["event_type"],
                               ts_col="ts", bucket="1 hour")

    # defined inside the test so cloudpickle ships it by value (tests/ is
    # not importable from Spark's Python workers)
    out_cols = [f.name for f in STREAM_SCORE_SCHEMA.fields]

    def legacy_score(key, pdf_iter, state):
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
        state.update(([float(n)], 0, n))
        yield pd.DataFrame(columns=out_cols)

    # 1) write a checkpoint under the LEGACY 3-field state layout
    legacy = read_events().groupBy("series_key").applyInPandasWithState(
        legacy_score,
        outputStructType=STREAM_SCORE_SCHEMA,
        stateStructType=_LEGACY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out1 = str(tmp_path / "out_legacy")
    q = (
        legacy.writeStream.format("parquet").option("path", out1)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    # 2) restart the SAME checkpoint with the current 4-field operator:
    # Spark's state-store schema check must refuse it with a schema
    # incompatibility error (clear upgrade signal, not silent corruption)
    # new data so the restart actually runs a stateful micro-batch (with no
    # fresh file, availableNow plans zero batches and never touches state)
    _write_stream_file(spark, src / "f2", 20, 40)
    scored = score_stream(read_events())
    out2 = str(tmp_path / "out_upgraded")
    with pytest.raises((StreamingQueryException, PySparkException)) as exc:
        q2 = (
            scored.writeStream.format("parquet").option("path", out2)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(300)
        if q2.exception() is not None:
            raise q2.exception()
    msg = str(exc.value).lower()
    assert "schema" in msg and ("compat" in msg or "state" in msg), msg
    # nothing was silently emitted by the incompatible restart
    emitted = [f for f in (tmp_path / "out_upgraded").glob("*.parquet")]
    assert not emitted or spark.read.parquet(out2).count() == 0
