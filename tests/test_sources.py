"""CSV/parquet source readers (SURVEY.md §2 S1/S3)."""

import numpy as np
import pandas as pd
import pytest

from anomaly_detector_spark.sources import (
    read_multivariate_csv,
    read_transcripts_csv,
    read_transcripts_parquet,
)


@pytest.fixture()
def csv_dir(tmp_path):
    pdf = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": [0, 1, 0],
        "role": ["user", "assistant", "user"],
        "text": ["hi", "hello", "yo"],
        "tool": [None, "search", None],
        "ts": ["2024-01-01 00:00:00", "2024-01-01 00:00:05", "2024-01-01 01:00:00"],
    })
    p = tmp_path / "transcripts_csv"
    p.mkdir()
    pdf.to_csv(p / "part-0.csv", index=False)
    return str(p)


def test_read_transcripts_csv(spark, csv_dir):
    df = read_transcripts_csv(spark, csv_dir)
    assert [f.name for f in df.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = {(r["conv_id"], r["turn_idx"]): r for r in df.collect()}
    assert rows[("c1", 1)]["tool"] == "search"
    assert rows[("c1", 1)]["ts"].second == 5
    assert rows[("c2", 0)]["tool"] is None


def test_read_transcripts_csv_malformed_rows_become_nulls(spark, tmp_path):
    p = tmp_path / "bad_csv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c1,not_an_int,user,hi,,2024-01-01 00:00:00\n"
        "c2,0,user,ok,,2024-01-01 00:00:01\n"
    )
    df = read_transcripts_csv(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["conv_id"])
    assert rows[0]["turn_idx"] is None  # malformed surfaces as null, not dropped
    assert rows[1]["turn_idx"] == 0


def test_read_multivariate_csv_sorts_and_casts(spark, tmp_path):
    p = tmp_path / "mv_csv"
    p.mkdir()
    (p / "part-0.csv").write_text(
        "timestamp,b_sensor,a_sensor\n"
        "2024-01-01 00:00:00,1.5,2\n"
        "2024-01-01 00:01:00,oops,3\n"
    )
    df = read_multivariate_csv(spark, str(p))
    assert df.columns == ["timestamp", "a_sensor", "b_sensor"]
    rows = sorted(df.collect(), key=lambda r: r["timestamp"])
    assert rows[0]["b_sensor"] == 1.5
    assert rows[1]["b_sensor"] is None  # uncastable -> NULL for fill_na
    assert rows[1]["a_sensor"] == 3.0


def test_parquet_roundtrip(spark, tmp_path):
    from anomaly_detector_spark.data import synth_transcripts

    t = synth_transcripts(spark, n_convs=20, seed=1)
    path = str(tmp_path / "transcripts_parquet")
    t.write.parquet(path)
    back = read_transcripts_parquet(spark, path)
    assert back.count() == t.count()
    # same names/types; nullability flags differ (enforced schema is nullable)
    assert [(f.name, f.dataType) for f in back.schema.fields] == \
           [(f.name, f.dataType) for f in t.schema.fields]
