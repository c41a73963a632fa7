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


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 64, shingle_k: int = 5, seed: int = 7) -> DataFrame:
    """MinHash signatures via the fused shingle+signature Arrow UDF.

    One Python crossing per document: the UDF normalizes, word-shingles,
    hashes, and min-hashes in vectorized numpy (see ``_minhash_udf``).  The
    r5 form split this into a JVM higher-order-function shingle expression
    plus a second pandas-UDF pass; Spark evaluates nested ``transform``/
    ``slice``/``concat_ws`` lambdas INTERPRETED (no whole-stage codegen for
    higher-order functions), which measured ~600us/doc — the fused numpy
    path is ~10x cheaper and produces one pass instead of two.
    """
    fused = _minhash_udf(num_hashes, bands=1, shingle_k=shingle_k, seed=seed)
    return docs.select(
        F.col(id_col), fused(F.col(text_col)).alias("_ss")
    ).select(id_col, F.col("_ss.signature").alias("signature"))


# splitmix64 finalizer constants — the standard 64-bit avalanche mixer
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)
# odd multiplier for the Horner combination of word hashes into a shingle
# hash (golden-ratio constant, same family as xxhash/splitmix increments)
_HORNER_C = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 avalanche over a uint64 array (vectorized, wraparound)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def _horner_windows(w: np.ndarray, k: int) -> np.ndarray:
    """Shingle hashes for every k-window of word-hash vector ``w``:
    Horner-combine k consecutive uint64 word hashes (wraparound multiply by
    an odd constant), then avalanche.  len(w) < k (including the empty doc's
    single sentinel word) degrades to ONE shingle over all words — the same
    semantics the string form had for short docs."""
    if len(w) < k:
        win = w[None, :]
    else:
        win = np.lib.stride_tricks.sliding_window_view(w, k)
    acc = win[:, 0].copy()
    for j in range(1, win.shape[1]):
        acc = acc * _HORNER_C + win[:, j]
    # mask to 63 bits after mixing so downstream int64 values are
    # non-negative, matching the abs(xxhash64) convention the universal-hash
    # signature family was calibrated for
    return (_mix64(acc) >> np.uint64(1)).astype(np.int64)


def _minhash_udf(num_hashes: int, bands: int, shingle_k: int, seed: int):
    """Fused text -> (shingle-hash set, minhash signature, band hashes) UDF.

    Everything runs vectorized per Arrow batch:

    - tokenization: pandas ``str.lower().str.split()`` (splits on whitespace
      runs and strips ends — identical token streams to the JVM
      ``normalize_text`` + ``split(" ")`` for ASCII whitespace; Python's
      ``str.split()`` additionally splits on Unicode whitespace such as NBSP,
      which Java's ``\\s`` does not)
    - word hashing: ``pd.factorize`` over the batch's flattened words, then
      blake2b-8 ONCE PER DISTINCT WORD (the vocabulary is far smaller than
      the shingle count; overlapping k-shingles share their words)
    - shingle hashing: Horner combination of k consecutive word hashes +
      splitmix64 avalanche (``_horner_windows``) — no per-shingle string is
      ever built
    - signature: the exact universal-hash family of the r5 implementation,
      ``min(((h % P) * a + b) % P)`` with P = 2^31-1, products < 2^62 so
      int64 arithmetic is exact
    - band hashes: Horner+avalanche over each band's ``rows_per_band``
      signature slice (``bands=1`` callers read only ``signature``)

    The shingle hash VALUES differ from the r5 xxhash64-of-string form (any
    well-mixed deterministic shingle->int64 map gives the same Jaccard and
    the same LSH s-curve); the planted-truth / recall-vs-brute-force /
    bucket-cap tests pin the behavior, and a determinism test pins
    run-to-run stability.
    """
    import hashlib
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
              for _ in range(num_hashes)]
    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    rows_per_band = num_hashes // bands

    def _word_hash(word: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(word.encode("utf-8"), digest_size=8).digest(),
            "little")

    @F.pandas_udf(
        "struct<sh: array<long>, signature: array<long>, band_hashes: array<long>>")
    def _fused(texts: pd.Series) -> pd.DataFrame:
        sh_out: list = [None] * len(texts)
        sig_out: list = [None] * len(texts)
        band_out: list = [None] * len(texts)
        notnull_pos = np.flatnonzero(texts.notna().to_numpy())
        word_lists = [
            ws if ws else [""]  # empty doc -> one sentinel shingle, as before
            for ws in texts.iloc[notnull_pos].str.lower().str.split()
        ]
        # factorize the batch's word stream once; hash each DISTINCT word
        flat: list[str] = []
        for words in word_lists:
            flat.extend(words)
        if flat:
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
            vocab_h = np.fromiter((_word_hash(w) for w in uniques),
                                  dtype=np.uint64, count=len(uniques))
            word_h = vocab_h[codes]
        else:
            word_h = np.empty(0, dtype=np.uint64)
        lengths = np.fromiter((len(ws) for ws in word_lists),
                              dtype=np.int64, count=len(word_lists))
        starts = np.concatenate(([0], np.cumsum(lengths)))
        for pos, loc in enumerate(notnull_pos):
            w = word_h[starts[pos]:starts[pos + 1]]
            sh = np.unique(_horner_windows(w, shingle_k))
            h = sh % _MERSENNE
            m = (h[:, None] * a_vec[None, :] + b_vec[None, :]) % _MERSENNE
            sig = m.min(axis=0)
            sh_out[loc] = sh
            sig_out[loc] = sig
            if bands > 1:
                # truncate a non-divisible remainder, as the slice() form did
                bw = sig[:bands * rows_per_band].astype(
                    np.uint64).reshape(bands, rows_per_band)
                acc = bw[:, 0].copy()
                for j in range(1, rows_per_band):
                    acc = acc * _HORNER_C + bw[:, j]
                band_out[loc] = _mix64(acc).astype(np.int64)
        return pd.DataFrame(
            {"sh": sh_out, "signature": sig_out, "band_hashes": band_out})

    return _fused


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
    hash collisions — negligible at any realistic shingle count — and means
    document text is NEVER shuffled past the pinning exchange or held twice:
    the one fused UDF pass consumes it.

    r6 plan change: shingling, signatures, AND band hashes now come out of
    ONE fused Arrow UDF (``_minhash_udf``).  The r5 plan computed shingles
    as a JVM higher-order-function expression and band hashes as a second
    HOF + string-concat pass; Spark evaluates HOF lambdas interpreted (no
    whole-stage codegen), which profiled at ~600us/doc — 3.2s of the 8.5s
    sf0.1 record was that one expression (BENCH/minhash_decomposition.json).
    The fused UDF runs in the scan-side stage after the pinning exchange, so
    the shuffle profile is unchanged: one exchange of (id, text) — the same
    byte volume as the old (id, shingle-hash array) exchange — then bucket /
    join / verify over longs only.
    """
    if bands < 2:
        # the fused UDF only emits band_hashes for bands > 1; a 1-band LSH
        # would also candidate every doc against every doc sharing ANY
        # signature value — reject instead of silently returning zero pairs
        raise ValueError(f"minhash_lsh_pairs needs bands >= 2, got {bands}")
    # CPU-heavy, byte-light stage: pin parallelism with an explicit user
    # repartition so AQE's size-based coalescing doesn't serialize the fused
    # hashing UDF (same rationale as drift scoring).  Persisted: three
    # consumers (band explode and both verify join sides) would otherwise
    # each re-run the UDF.
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    fused = _minhash_udf(num_hashes, bands, shingle_k, seed)
    hashed = (
        docs.select(F.col(id_col), F.col(text_col))
        .repartition(par, id_col)
        .select(F.col(id_col), fused(F.col(text_col)).alias("_ss"))
        .select(id_col, F.col("_ss.sh").alias("sh"),
                F.col("_ss.band_hashes").alias("band_hashes"))
        .persist()
    )
    band_entries = hashed.select(
        id_col, F.posexplode("band_hashes").alias("band", "band_hash")
    )
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
    # Persist the POST-filter entries (r7): the r6 form persisted the raw
    # explode and applied the anti-join separately under each self-join
    # side, so the plan carried the oversized aggregation and its broadcast
    # build TWICE.  Caching the filtered rows instead runs the explode twice
    # (a narrow re-read of the cached ``hashed`` table) but the aggregation,
    # broadcast, and anti-join exactly once — one fewer aggregation pass and
    # one fewer broadcast build at every scale.  Released via the handle.
    band_entries = band_entries.join(
        F.broadcast(oversized), ["band", "band_hash"], "left_anti"
    ).persist()
    cached_band_entries = band_entries
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
    # sh is already distinct+sorted (np.unique inside the fused UDF)
    shingled = hashed.select(F.col(id_col), F.col("sh").alias("shingle_set"))
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
