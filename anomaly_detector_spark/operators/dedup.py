"""Deduplication operators for large-scale training-data pipelines.

All candidate-generation steps are pure DataFrame ops (hash/group/join) so
Catalyst plans them as shuffles with map-side partial aggregation; only
similarity verification on candidate *pairs* (tiny relative to the corpus)
touches strings twice.

- exact_duplicates    : full-text hash groupBy (reference V7 analogue at
                        document granularity)
- minhash_lsh_pairs   : shingle -> minhash signature -> banded LSH buckets ->
                        within-bucket candidate join -> exact Jaccard verify
- simhash_buckets     : 64-bit simhash + Hamming-band grouping
- ngram_jaccard_pairs : token n-gram Jaccard on LSH candidates
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# Mersenne prime 2^31-1 for the universal hash family: (h % P) * a + b stays
# below 2^62, so the arithmetic is exact in a Spark long even under ANSI mode.
_MERSENNE = (1 << 31) - 1


@dataclass
class CachedResult:
    """A result DataFrame plus the intermediate caches its plan pinned.

    Mirrors ``ValidationResult.release()`` (engine/runner.py): operators that
    persist shared intermediates (band tables, bucket entries) hand the
    caller a deterministic unpersist path instead of leaking session-LRU
    entries across looped corpora.  Usable as a context manager::

        with minhash_lsh_pairs(docs) as pairs:
            pairs.count()
    """

    df: DataFrame
    _persisted: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self._persisted.clear()

    def __enter__(self) -> DataFrame:
        return self.df

    def __exit__(self, *exc) -> None:
        self.release()


def normalize_text(col):
    """Lowercase, collapse whitespace — deterministic canonical form."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents (after canonicalization).

    Hash first (xxhash64) so the shuffle carries an 8-byte key instead of the
    document body; the full text is never shuffled.
    """
    hashed = docs.select(
        F.col(id_col), F.xxhash64(normalize_text(F.col(text_col))).alias("text_hash")
    )
    groups = (
        hashed.groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("dup_count") > 1)
    )
    return groups.select("text_hash", "dup_count", "doc_ids").orderBy("text_hash")


def _shingles(text_col, k: int = 5):
    """Word k-shingles as an array column (JVM-side, no UDF)."""
    words = F.split(normalize_text(text_col), " ")
    n = F.size(words)
    return F.when(n >= k,
                  F.transform(F.sequence(F.lit(0), n - k),
                              lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
                  ).otherwise(F.array(F.concat_ws(" ", words)))


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 64, shingle_k: int = 5, seed: int = 7) -> DataFrame:
    """MinHash signatures: shingle hashing stays a JVM expression
    (``xxhash64`` over word shingles), the ``num_hashes`` universal hashes +
    min run as one Arrow-batched numpy matmul per document.

    The earlier all-expression form ran 64 separate ``transform``/
    ``array_min`` passes, each materializing a fresh array per document
    (~540us/doc); the numpy form computes the same
    ``min((h % P) * a + b % P)`` values exactly ((h%P)*a+b < 2^62, exact in
    int64) in a single (shingles x hashes) broadcast.
    """
    _sig = _signature_udf(num_hashes, seed)
    with_shingles = docs.select(
        F.col(id_col), _hashed_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    return with_shingles.select(id_col, _sig(F.col("sh")).alias("signature"))


def _hashed_shingles(text_col, k: int):
    """8-byte xxhash64 per word k-shingle (JVM expression, pre-shuffle)."""
    return F.transform(_shingles(text_col, k), lambda s: F.abs(F.xxhash64(s)))


def _signature_udf(num_hashes: int, seed: int):
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(num_hashes)]
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)

    @F.pandas_udf("array<long>")
    def _sig(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            if arr is None:
                out.append(None)
                continue
            h = np.asarray(arr, dtype=np.int64) % _MERSENNE
            m = (h[:, None] * a_vec[None, :] + b_vec[None, :]) % _MERSENNE
            out.append(m.min(axis=0))
        return pd.Series(out, dtype=object)

    return _sig


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      num_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7, seed: int = 7,
                      max_bucket_size: int = 500) -> "CachedResult":
    """Near-duplicate pairs: banded LSH candidates + exact shingle Jaccard.

    Shuffle profile: one shuffle to bucket (band_id, band_hash), a self-join
    only *within* buckets (bounded by bucket size), then a verify step that
    re-reads only candidate pair texts.  This is the standard scale-out
    MinHash plan — no O(n^2) comparisons.

    ``max_bucket_size`` caps the within-bucket self-join: a degenerate bucket
    (empty/boilerplate docs all sharing a band hash) is otherwise quadratic in
    bucket size — the one shape that blows up on real corpora.  Buckets above
    the cap are dropped from candidate generation; their members are near-
    certainly byte-identical or boilerplate, which the exact-dedup pass
    (``exact_duplicates``) catches at O(n).  A doc pair still becomes a
    candidate if ANY of its ``bands`` buckets is under the cap.

    Returns a ``CachedResult``: the pair DataFrame plus a ``release()`` hook
    for the two persisted intermediates (hashed shingle sets, band entries).

    The verify step computes exact Jaccard over the *hashed* shingle sets
    (distinct 64-bit shingle hashes).  This equals string-set Jaccard up to
    xxhash64 collisions — negligible at any realistic shingle count — and
    means document text is NEVER shuffled or held twice: the only text pass
    is the shingle-hash projection inside the scan stage.
    """
    rows_per_band = num_hashes // bands
    # Shingle-hash in the SCAN stage, so the parallelism-pinning repartition
    # below exchanges (id, array<long>) — hashed longs, never text bodies.
    hashed = docs.select(
        F.col(id_col), _hashed_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    # CPU-heavy, byte-light stage: pin parallelism with an explicit user
    # repartition so AQE's size-based coalescing doesn't serialize the
    # signature computation (same rationale as drift scoring).  Persisted:
    # three consumers (the signature pass and both verify join sides) would
    # otherwise each re-run the scan + shingle expression.
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    hashed = hashed.repartition(par, id_col).persist()
    sigs = hashed.select(
        id_col, _signature_udf(num_hashes, seed)(F.col("sh")).alias("signature")
    )
    band_entries = sigs.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws("_", F.transform(
                        F.slice("signature", b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string")))).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")
    # band_entries feeds THREE consumers (the oversized-bucket aggregation and
    # both sides of the candidate self-join); without a persist each one
    # re-evaluates the pandas-UDF signature pass and the doc repartition.
    # Cache the post-UDF rows once — they are tiny ((id, band, hash) longs,
    # ~bands rows per doc) compared to recomputing signatures.  Released via
    # the returned handle.
    band_entries = band_entries.persist()
    cached_band_entries = band_entries  # the anti-join below reassigns the name
    # Cap degenerate buckets before the self-join via a broadcast ANTI-join
    # against the oversized-bucket keys.  The size aggregation combines
    # map-side (a mega-bucket collapses to one row per mapper), and the
    # anti-join's broadcast side holds only buckets OVER the cap — a handful
    # of keys even on pathological corpora — so the entries themselves are
    # never shuffled or sorted into a single mega-bucket task (which a
    # count-window or a join on the full size table would do).
    oversized = (
        band_entries.groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select("band", "band_hash")
    )
    band_entries = band_entries.join(F.broadcast(oversized), ["band", "band_hash"], "left_anti")
    left = band_entries.alias("l")
    right = band_entries.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    shingled = hashed.select(
        F.col(id_col), F.array_distinct("sh").alias("shingle_set")
    )
    verified = (
        candidates.join(shingled.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingle_set", "set_a"), "id_a")
        .join(shingled.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingle_set", "set_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return CachedResult(verified.orderBy("id_a", "id_b"), [hashed, cached_band_entries])


def simhash_buckets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    band_bits: int = 16, num_bands: int = 4) -> DataFrame:
    """64-bit SimHash per document, banded into ``num_bands`` non-overlapping
    ``band_bits``-bit keys — one output row per (doc, band).

    Two docs within Hamming distance d collide on at least one band whenever
    d < num_bands (pigeonhole), so multi-band grouping gives real near-dup
    recall where a single top-bits band does not.

    Plan shape: explode tokens -> xxhash64 once per token -> 64 map-side-
    combining SUM bit-votes per doc (one shuffle carrying one 64-long row per
    doc per map partition) -> assemble the fingerprint -> explode bands.
    All JVM expressions; the token hash is computed exactly once (the previous
    form re-derived the token-hash array inside 64 separate ``aggregate``
    lambdas and leaned on codegen CSE).
    """
    # NULL text coalesces to "" so the doc still emits rows (explode of a
    # null array would silently drop it from every band)
    tokens = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.coalesce(F.col(text_col), F.lit(""))), " ")).alias("_tok"),
    ).select(id_col, F.xxhash64("_tok").alias("_h"))
    votes = tokens.groupBy(id_col).agg(*[
        F.sum(
            F.when(F.shiftright("_h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(64)
    ])
    simhash = None
    for i in range(64):
        bit = F.when(F.col(f"_b{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        simhash = term if simhash is None else simhash.bitwiseXOR(term)
    fp = votes.select(F.col(id_col), simhash.alias("simhash"))
    mask = (1 << band_bits) - 1
    bands = F.array(*[
        F.struct(
            F.lit(k).alias("band_id"),
            F.shiftrightunsigned("simhash", k * band_bits).bitwiseAND(F.lit(mask)).alias("band_key"),
        )
        for k in range(num_bands)
    ])
    return fp.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", "b.band_id", "b.band_key"
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding", n_planes: int = 8,
                        n_tables: int = 8, seed: int = 23) -> "CachedResult":
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= threshold).

    Scale shape mirrors minhash_lsh_pairs: random-hyperplane LSH bucket
    entries in exploded (table_id, bucket) form (similarity.lsh_bucket_entries
    — one Arrow UDF pass, plan carries no vector literals) generate
    candidates via ONE self-join on (table_id, bucket) covering all
    ``n_tables`` tables at once; pairs dedupe across tables, then the exact
    cosine check joins the vectors back by id and runs on candidates only —
    never all-pairs, and vectors never ride through candidate generation.
    Recall comes from the multi-table union:
    P[collision] = 1-(1-(1-theta/pi)^planes)^tables, which for
    near-duplicates (theta ~ 0.2 rad at cosine 0.98) is ~1 at 8x8.

    Returns a ``CachedResult`` (release() unpersists the bucket entries)."""
    from anomaly_detector_spark.operators.similarity import (
        _dot,
        _norm,
        lsh_bucket_entries,
    )

    base = embeddings.select(id_col, F.col(vec_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    # One hyperplane-UDF pass feeds both sides of the candidate self-join;
    # the entries are (id, table_id, bucket) longs — tiny — so persisting
    # them (released via the returned handle) beats re-running the UDF.
    entries = lsh_bucket_entries(base, id_col, "v", dim, n_planes, n_tables, seed).persist()
    candidates = (
        entries.select(F.col(id_col).alias("id_a"), "table_id", "bucket")
        .join(entries.select(F.col(id_col).alias("id_b"), "table_id", "bucket"),
              ["table_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    out = (
        candidates.join(base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("cosine", _dot("va", "vb") / (_norm(F.col("va")) * _norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
        .orderBy("id_a", "id_b")
    )
    return CachedResult(out, [entries])
