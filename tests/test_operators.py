"""Operator correctness: dedup, similarity, text analysis, drift, multimodal."""

import numpy as np
import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_duplicates_detects_planted(spark, docs):
    from anomaly_detector_spark.operators.dedup import exact_duplicates

    # plant exact duplicates by unioning a shifted copy of 10 docs
    dup = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    groups = exact_duplicates(docs.unionAll(dup)).collect()
    assert len(groups) == 10
    assert all(g["dup_count"] == 2 for g in groups)


def test_minhash_finds_planted_near_dups(spark, docs):
    from anomaly_detector_spark.operators.dedup import minhash_lsh_pairs

    # plant near-duplicates: copy 5 docs with a few words appended
    near = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail tail")))
    )
    pairs = minhash_lsh_pairs(docs.unionAll(near), jaccard_threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + 2_000_000) for i in range(5)}
    assert planted <= found
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)


def test_simhash_near_dups_share_band(spark, docs):
    from anomaly_detector_spark.operators.dedup import simhash_buckets

    near = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    )
    sh = simhash_buckets(docs.unionAll(near)).collect()
    by_id = {r["doc_id"]: r["band"] for r in sh}
    same = sum(1 for i in range(5) if by_id[i] == by_id[i + 2_000_000])
    assert same >= 3  # most near-identical docs land in the same 16-bit band


def test_brute_force_topk_self_is_rank1(spark, embeddings):
    from anomaly_detector_spark.operators.similarity import brute_force_topk

    q = embeddings.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(embeddings, q, k=5).collect()
    rank1 = {r["query_id"]: r["vec_id"] for r in top if r["rank"] == 1}
    assert rank1 == {0: 0, 1: 1, 2: 2}


def test_lsh_topk_recall(spark, embeddings):
    from anomaly_detector_spark.operators.similarity import brute_force_topk, lsh_topk

    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, q, k=10).collect()
    approx = lsh_topk(embeddings, q, dim=64, k=10, n_planes=4, n_tables=8).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert np.mean(recalls) >= 0.4  # coarse LSH at test scale (tunable knobs)


def test_language_id_accuracy(spark, docs):
    from anomaly_detector_spark.operators.text import language_id

    known = docs.filter(F.col("lang").isin(["en", "de", "fr", "es"]))
    pred = language_id(known).join(known.select("doc_id", "lang"), "doc_id")
    rows = pred.collect()
    acc = sum(1 for r in rows if r["lang_pred"] == r["lang"]) / len(rows)
    # synthetic corpus text is pseudo-words; just require the plumbing to be
    # deterministic and total
    assert len(rows) == known.count()
    assert 0.0 <= acc <= 1.0


def test_text_quality_columns(spark, docs):
    from anomaly_detector_spark.operators.text import text_quality

    q = text_quality(docs).collect()
    assert all(r["n_words"] >= 1 for r in q)
    assert all(0 <= r["punct_ratio"] <= 1 for r in q)
    assert all(0 <= r["stopword_ratio"] <= 1 for r in q)


def test_drift_pipeline_shapes(spark, sf_dir):
    from anomaly_detector_spark.operators.drift import derive_series, drift_verdicts, score_drift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    series = derive_series(ev, ["event_type"], "ts", "1 hour",
                           {"rate": F.count(F.lit(1)).cast("double")})
    scored = score_drift(series, granularity="hourly")
    rows = scored.collect()
    assert len(rows) > 0
    verd = drift_verdicts(scored).collect()
    assert {r["series_key"] for r in verd} == {r["series_key"] for r in rows}
    # per-point outputs carry value and expected_value for every point
    assert all(r["expected_value"] is not None for r in rows)


def test_multimodal_stub_features(spark):
    from anomaly_detector_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    assert all(len(r["feature"]) == 16 for r in feats)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)
    plan = frame_sample_plan(media, every_ms=1000)
    assert plan.filter(F.col("frame_ts_ms") % 1000 != 0).count() == 0
