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
    pairs = minhash_lsh_pairs(docs.unionAll(near), jaccard_threshold=0.5).df.collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(i, i + 2_000_000) for i in range(5)}
    assert planted <= found
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)


def test_minhash_recall_vs_brute_force(spark, docs):
    """LSH candidate generation must recover (nearly) all true pairs above the
    Jaccard threshold.  With 64 hashes / 16 bands the s-curve gives pair-catch
    probability 1-(1-s^4)^16 ~ 0.986 at s=0.7; we assert recall >= 0.9 against
    an exact all-pairs Jaccard over a 150-doc sample."""
    from anomaly_detector_spark.operators.dedup import minhash_lsh_pairs, normalize_text

    near = (
        docs.limit(20)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    sample = docs.limit(130).unionAll(near)

    # exact ground truth: brute-force shingle Jaccard over all pairs
    words = F.split(normalize_text(F.col("text")), " ")
    n = F.size(words)
    k = 5
    sh = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(0), n - k),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    sets = sample.select("doc_id", F.array_distinct(sh).alias("s"))
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    truth = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", F.size(F.array_intersect("sa", "sb")) / F.size(F.array_union("sa", "sb")))
        .filter(F.col("j") >= 0.7)
        .select("id_a", "id_b")
        .collect()
    )
    true_pairs = {(r["id_a"], r["id_b"]) for r in truth}
    assert len(true_pairs) >= 20  # the planted near-dups are all above 0.7

    found = minhash_lsh_pairs(sample, jaccard_threshold=0.7).df.collect()
    found_pairs = {(r["id_a"], r["id_b"]) for r in found}
    # verify step guarantees precision; recall comes from the banding
    assert found_pairs <= true_pairs
    assert len(found_pairs & true_pairs) / len(true_pairs) >= 0.9


def test_minhash_fused_udf_deterministic_and_shaped(spark, docs):
    """The r6 fused shingle+signature UDF must be bit-stable across runs
    (blake2b word hashes + fixed-seed universal hash family — no
    PYTHONHASHSEED dependence) and produce sorted-distinct shingle sets and
    num_hashes-long signatures; Jaccard of a doc with itself is exactly 1."""
    from anomaly_detector_spark.operators.dedup import _minhash_udf, minhash_signatures

    sample = docs.limit(50)
    a = {r["doc_id"]: r["signature"]
         for r in minhash_signatures(sample).collect()}
    b = {r["doc_id"]: r["signature"]
         for r in minhash_signatures(sample).collect()}
    assert a == b
    assert all(len(sig) == 64 for sig in a.values())
    assert all(all(0 <= v < (1 << 31) - 1 for v in sig) for sig in a.values())

    fused = _minhash_udf(num_hashes=64, bands=16, shingle_k=5, seed=7)
    rows = sample.select("doc_id", fused(F.col("text")).alias("s")).collect()
    for r in rows:
        sh = r["s"]["sh"]
        assert sh == sorted(set(sh))  # np.unique: distinct + ascending
        assert all(v >= 0 for v in sh)  # 63-bit masked, non-negative
        assert len(r["s"]["band_hashes"]) == 16
    # identical text in two docs -> identical shingle sets and signatures
    dup = sample.limit(1).selectExpr("doc_id + 900000 as doc_id", "text")
    both = sample.limit(1).select("doc_id", "text").unionAll(dup)
    out = both.select("doc_id", fused(F.col("text")).alias("s")).collect()
    assert out[0]["s"]["sh"] == out[1]["s"]["sh"]
    assert out[0]["s"]["signature"] == out[1]["s"]["signature"]


def test_minhash_fused_udf_null_and_empty_text(spark):
    """NULL text yields a null struct-field row (dropped by the band
    explode, as the r5 expression form did); empty/whitespace text hashes
    the single sentinel shingle and still produces a full signature."""
    from anomaly_detector_spark.operators.dedup import _minhash_udf

    fused = _minhash_udf(num_hashes=64, bands=16, shingle_k=5, seed=7)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r["s"] for r in
            df.select("doc_id", fused(F.col("text")).alias("s")).collect()}
    assert rows[1]["sh"] is None and rows[1]["signature"] is None
    # empty and whitespace-only normalize to the same sentinel shingle
    assert rows[2]["sh"] == rows[3]["sh"]
    assert len(rows[2]["sh"]) == 1 and len(rows[2]["signature"]) == 64
    # a 2-word doc (< k) degrades to one whole-doc shingle
    assert len(rows[4]["sh"]) == 1


def test_minhash_bucket_cap_bounds_degenerate_buckets(spark, docs):
    """200 identical boilerplate docs form one degenerate bucket per band;
    with the cap they are excluded from candidate generation (exact-dedup owns
    them), and genuine near-dup pairs are still found."""
    from anomaly_detector_spark.operators.dedup import minhash_lsh_pairs

    boiler = (
        spark.range(200)
        .select(
            (F.col("id") + 5_000_000).alias("doc_id"),
            F.lit("lorem ipsum boilerplate header please ignore this page body").alias("text"),
        )
    )
    near = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    sample = docs.limit(50).select("doc_id", "text").unionAll(near.select("doc_id", "text")).unionAll(boiler)
    pairs = minhash_lsh_pairs(sample, jaccard_threshold=0.5, max_bucket_size=100).df.collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert not any(i >= 5_000_000 for i in ids)  # degenerate bucket dropped
    planted = {(i, i + 2_000_000) for i in range(5)}
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert planted <= found  # real near-dups unaffected by the cap


def test_simhash_near_dups_share_band(spark, docs):
    from anomaly_detector_spark.operators.dedup import simhash_buckets

    near = (
        docs.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" x")))
    )
    sh = simhash_buckets(docs.unionAll(near)).collect()
    buckets: dict[int, set] = {}
    fps: dict[int, int] = {}
    for r in sh:
        buckets.setdefault(r["doc_id"], set()).add((r["band_id"], r["band_key"]))
        fps[r["doc_id"]] = r["simhash"]
    # every doc emits one row per band
    assert all(len(v) == 4 for v in buckets.values())
    # near-identical docs collide on at least one of the 4 bands
    # (guaranteed when Hamming distance < num_bands, near-certain here)
    same = sum(1 for i in range(5) if buckets[i] & buckets[i + 2_000_000])
    assert same == 5
    # and their fingerprints are close in Hamming distance
    max_ham = max(bin(fps[i] ^ fps[i + 2_000_000]).count("1") for i in range(5))
    assert max_ham <= 8


def test_winnowing_fingerprint_matches_hand_computation(spark):
    """The winnowing LOGIC (sliding-window mins, dedup, sort, short-doc edge
    cases) verified against an independent Python recomputation.  The k-gram
    hash values themselves come from one trivial Spark xxhash64 projection,
    so the assertion isolates the window algebra, which DuckDB can't oracle."""
    from anomaly_detector_spark.operators.text import document_fingerprint

    k, window = 8, 4
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]  # n=12
    text = " ".join(words)  # already normalized: lowercase, single spaces
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]  # 5 grams
    hashes = [
        r["h"]
        for r in spark.createDataFrame([(g,) for g in grams], "g string")
        .select(F.xxhash64("g").alias("h")).collect()
    ]
    expected = sorted({min(hashes[i:i + window]) for i in range(len(hashes) - window + 1)})

    docs = spark.createDataFrame(
        [(0, text),
         (1, "just three words"),        # n < k -> one whole-text gram
         (2, " ".join(words[:9]))],      # 2 grams < window -> single min
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["fingerprint"])
           for r in document_fingerprint(docs, k=k, window=window).collect()}
    assert out[0] == expected
    h_short = spark.createDataFrame([("just three words",)], "g string") \
        .select(F.xxhash64("g").alias("h")).collect()[0]["h"]
    assert out[1] == [h_short]
    grams9 = [" ".join(words[:9][i:i + k]) for i in range(2)]
    h9 = [r["h"] for r in spark.createDataFrame([(g,) for g in grams9], "g string")
          .select(F.xxhash64("g").alias("h")).collect()]
    assert out[2] == [min(h9)]


def test_simhash_pigeonhole_guarantee(spark, docs):
    """For every pair whose MEASURED Hamming distance is < num_bands, the
    pigeonhole principle guarantees at least one shared band — assert the
    guarantee itself, not just empirical collision."""
    from anomaly_detector_spark.operators.dedup import simhash_buckets

    near = (
        docs.limit(20)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" y")))
    )
    sh = simhash_buckets(docs.limit(20).unionAll(near), num_bands=4).collect()
    bands: dict[int, set] = {}
    fps: dict[int, int] = {}
    for r in sh:
        bands.setdefault(r["doc_id"], set()).add((r["band_id"], r["band_key"]))
        fps[r["doc_id"]] = r["simhash"]
    checked = 0
    for i in range(20):
        ham = bin(fps[i] ^ fps[i + 2_000_000]).count("1")
        if ham < 4:  # num_bands
            assert bands[i] & bands[i + 2_000_000], f"pair {i}: ham={ham} but no shared band"
            checked += 1
    assert checked >= 10  # appending one token must keep most pairs within 3 bits


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

    # more tables -> multi-probe union recall rises; at 16 tables x 4 planes
    # the measured recall on the deterministic sf0.001 embeddings is 0.94
    # (hyperplane LSH theory: P[all 4 planes agree] = (1 - theta/pi)^4 per
    # table, unioned over 16 independent tables).  Assert the operator keeps
    # delivering that, not just "runs".
    approx16 = lsh_topk(embeddings, q, dim=64, k=10, n_planes=4, n_tables=16).collect()
    sets16 = {}
    for r in approx16:
        sets16.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls16 = [
        len(exact_sets[qid] & sets16.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert np.mean(recalls16) >= 0.9


def test_language_id_accuracy(spark, docs):
    from anomaly_detector_spark.operators.text import language_id

    known = docs.filter(F.col("lang").isin(["en", "de", "fr", "es"]))
    pred = language_id(known).join(known.select("doc_id", "lang"), "doc_id")
    rows = pred.collect()
    # synthetic corpus text is pseudo-words; require the plumbing to be
    # deterministic and total
    assert len(rows) == known.count()


def test_language_id_real_text(spark):
    """Real sentences in each language must classify correctly — script
    ranges for non-Latin, trigram profiles for Latin."""
    from anomaly_detector_spark.operators.text import language_id

    samples = [
        (0, "en", "The quick brown fox jumps over the lazy dog and then it ran to the hills for the evening."),
        (1, "de", "Der schnelle braune Fuchs springt über den faulen Hund und die Kinder lachen über die Geschichte."),
        (2, "fr", "Le renard brun rapide saute par-dessus le chien paresseux et les enfants que nous avons vus rient."),
        (3, "es", "El rápido zorro marrón salta sobre el perro perezoso y los niños que estaban en la casa se ríen."),
        (4, "it", "La volpe marrone veloce salta sopra il cane pigro e per questo che tutti gli amici ridono della storia."),
        (5, "pt", "A raposa marrom rápida salta sobre o cão preguiçoso e uma menina que estava na casa de campo sorriu."),
        (6, "nl", "De snelle bruine vos springt over de luie hond en een van de kinderen lacht om het verhaal van vandaag."),
        (7, "zh", "敏捷的棕色狐狸跳过了懒狗，孩子们听到这个故事都笑了起来。"),
        (8, "ru", "Быстрая коричневая лиса перепрыгнула через ленивую собаку, и дети засмеялись."),
        (9, "ja", "素早い茶色のきつねはのろまな犬をとびこえて、こどもたちはわらいました。"),
        (10, "ar", "القفز الثعلب البني السريع فوق الكلب الكسول وضحك الأطفال على القصة."),
        (11, "ko", "빠른 갈색 여우가 게으른 개를 뛰어넘었고 아이들이 웃었습니다."),
        # kanji-heavy formal Japanese: kana presence must beat the raw
        # CJK-ratio vote that would otherwise say zh
        (12, "ja", "東京都知事選挙の結果が発表された。投票率は前回を上回った。"),
    ]
    df = spark.createDataFrame([(i, t) for i, _, t in samples], "doc_id long, text string")
    pred = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    wrong = [(i, lang, pred[i]) for i, lang, _ in samples if pred[i] != lang]
    assert not wrong, wrong


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


def test_multimodal_real_decode_features(spark):
    from anomaly_detector_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    # every synthetic payload decodes through a real container codec
    assert all(r["decode_ok"] for r in feats)
    assert {r["container"] for r in feats} <= {"ppm", "bmp", "wav", "y4m"}
    assert all(len(r["feature"]) == 18 for r in feats)  # grid^2 + 2
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)
    # malformed payloads surface as decode_ok=False, never exceptions
    broken = media.withColumn(
        "payload",
        F.when(F.col("media_id") == 0, F.lit(b"\x00garbage")).otherwise(F.col("payload")),
    )
    bad = [r for r in extract_features(broken).collect() if r["media_id"] == 0]
    assert bad and not bad[0]["decode_ok"] and bad[0]["feature"] is None
    plan = frame_sample_plan(media, every_ms=1000)
    assert plan.filter(F.col("frame_ts_ms") % 1000 != 0).count() == 0


def test_multimodal_resize_and_frames(spark):
    from anomaly_detector_spark.functions import codecs
    from anomaly_detector_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, n=48)
    kinds = {r["media_id"]: r["kind"] for r in media.select("media_id", "kind").collect()}

    thumbs = resize_images(media, out_h=8, out_w=8).collect()
    assert len(thumbs) == sum(1 for k in kinds.values() if k == "image") > 0
    for r in thumbs:
        img = codecs.decode_ppm(bytes(r["thumb"]))
        assert img.shape == (8, 8, 3)

    frames = sample_frames(media, every=2).collect()
    vids = {m for m, k in kinds.items() if k == "video"}
    assert vids and {r["media_id"] for r in frames} == vids
    # 8-frame synthetic videos sampled every 2nd frame -> 4 rows each
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 2, 4, 6] for v in per.values())
    assert all(len(r["feature"]) == 18 for r in frames)


def test_acf_query_matches_kernel(spark, sf_dir):
    """PD6: the SQL-side ACF query must agree with the numpy kernel the
    correlogram detector actually uses (same statsmodels normalization)."""
    import __spark_entry__ as entry_mod
    from anomaly_detector_spark.kernels.period import acf

    rows = entry_mod.queries()["acf_event_rate"](spark, sf_dir).collect()
    hourly = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("v"))
        .orderBy("h")
        .collect()
    )
    series = np.array([r["v"] for r in hourly])
    r, _conf = acf(series, nlags=24)
    for row in rows:
        assert row["acf"] == pytest.approx(round(float(r[row["lag"]]), 6), abs=2e-6)


def test_ivf_topk_recall_and_exactness_at_full_probe(spark, embeddings):
    """IVF coarse-quantizer ANN: distributed Lloyd's training, probe-join
    search.  At nprobe == n_centroids the candidate set is the full corpus,
    so results must EQUAL brute force; at nprobe=4/16 recall must stay high
    on the deterministic embeddings."""
    from anomaly_detector_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_train,
    )

    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, q, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    centroids = ivf_train(embeddings, n_centroids=16, iters=3)
    assert len(centroids) == 16 and all(len(c) == 64 for c in centroids)

    # full probe == exhaustive: exact equality with brute force
    full = ivf_topk(embeddings, q, centroids, k=10, nprobe=16).collect()
    full_sets = {}
    for r in full:
        full_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert full_sets == exact_sets

    # partial probe: high recall
    approx = ivf_topk(embeddings, q, centroids, k=10, nprobe=4).collect()
    sets = {}
    for r in approx:
        sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[qid] & sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert np.mean(recalls) >= 0.6


def test_ivf_train_deterministic(spark, embeddings):
    from anomaly_detector_spark.operators.similarity import ivf_train

    c1 = ivf_train(embeddings, n_centroids=8, iters=2, seed=7)
    c2 = ivf_train(embeddings, n_centroids=8, iters=2, seed=7)
    assert c1 == c2


def test_ivf_train_driver_and_distributed_paths_agree(spark, embeddings,
                                                      monkeypatch):
    """The driver-side numpy fast path (sample fits _DRIVER_TRAIN_FLOATS)
    and the distributed Lloyd path share init + update rules; centroids must
    agree to float-summation-order tolerance."""
    import numpy as np

    from anomaly_detector_spark.operators import similarity

    fast = similarity.ivf_train(embeddings, n_centroids=8, iters=2, seed=7)
    monkeypatch.setattr(similarity, "_DRIVER_TRAIN_FLOATS", 0)
    dist = similarity.ivf_train(embeddings, n_centroids=8, iters=2, seed=7)
    assert np.allclose(np.asarray(fast), np.asarray(dist), rtol=1e-9, atol=1e-12)


def test_embedding_near_dups_planted(spark, embeddings):
    """Planted perturbed copies are found exactly; the clean corpus yields
    zero pairs (max natural cosine ~0.5 at sf0.001)."""
    from anomaly_detector_spark.operators.dedup import embedding_near_dups

    base = embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    assert embedding_near_dups(base, threshold=0.95, dim=64).df.count() == 0

    planted = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.05)),
            F.expr("slice(embedding, 2, size(embedding) - 1)"),
        ).alias("embedding"),
    )
    pairs = embedding_near_dups(base.unionAll(planted), threshold=0.95, dim=64).df.collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(i, i + 100000) for i in range(10)}
    assert all(r["cosine"] >= 0.99 for r in pairs)


def test_dedup_release_no_cache_growth(spark, docs, embeddings):
    """minhash_lsh_pairs / embedding_near_dups hand back releasable handles:
    looping over corpora with release() leaves NO residual cached plans in
    the session's CacheManager (the round-3 leak: band_entries / bucket
    entries persisted with no unpersist path)."""
    from anomaly_detector_spark.operators.dedup import (
        embedding_near_dups,
        minhash_lsh_pairs,
    )

    def n_cached():
        return spark._jsparkSession.sharedState().cacheManager().cachedData().size()

    base_emb = embeddings.select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("embedding")
    )
    before = n_cached()
    for i in range(2):
        res = minhash_lsh_pairs(docs.limit(40 + i), jaccard_threshold=0.5)
        res.df.count()
        res.release()
        # context-manager form releases on exit
        with embedding_near_dups(base_emb.limit(30 + i), threshold=0.99, dim=64) as pairs:
            pairs.count()
    assert n_cached() == before


def test_ivf_indexed_prunes_partitions_and_matches(spark, embeddings, tmp_path):
    """ivf_write_index + ivf_topk_indexed: the materialized cluster_id-
    partitioned index (a) returns the same results as the per-query
    assignment path, (b) plans the probe scan with partition pruning down to
    the probed cells, and (c) adds no corpus-side Exchange before the
    candidate join (the probe side broadcasts)."""
    from anomaly_detector_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_indexed,
        ivf_train,
        ivf_write_index,
    )

    centroids = ivf_train(embeddings, n_centroids=16, iters=2, seed=7)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(embeddings, centroids, path)

    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    direct = ivf_topk(embeddings, q, centroids, k=10, nprobe=4).collect()
    indexed = ivf_topk_indexed(spark, path, q, centroids, k=10, nprobe=4).collect()
    assert [tuple(r) for r in indexed] == [tuple(r) for r in direct]

    # plan shape: partition filter present on the scan, pruning below the
    # full centroid count, and the only exchanges sit AFTER the candidate
    # join (top-k window + output sort), never on the corpus scan side
    # plan check at nprobe=2 so the probed union stays well under the 16
    # cells even in the worst query spread
    df = ivf_topk_indexed(spark, path, q, centroids, k=10, nprobe=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster_id" in m.group(1)
    # parse only the IN/INSET value list — the filter text also carries
    # attribute ids like 'cluster_id#245' that must not count as clusters
    in_list = re.search(r"IN \(([^)]*)\)", m.group(1)) or re.search(
        r"INSET ((?:-?\d+(?:, )?)+)", m.group(1))
    assert in_list is not None
    probed = {int(x) for x in re.findall(r"-?\d+", in_list.group(1))}
    assert 0 < len(probed) < 16
