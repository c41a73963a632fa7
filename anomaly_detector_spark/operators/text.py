"""Text analysis operators — language ID, quality scoring, token counting,
fingerprinting.  Everything except language-ID n-gram scoring is built-in
SQL expressions (JVM-side); language ID is a vectorized pandas UDF over a
small per-language trigram table (no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from anomaly_detector_spark.operators.dedup import normalize_text

# Tiny deterministic stopword/trigram profiles for a heuristic language ID.
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "to ", " of", "ed ", " a ", "is ", "at "],
    "de": ["der", "die", "und", "ein", "ich", "sch", "en ", "ung", " zu", "cht"],
    "fr": ["le ", "de ", "les", "ent", "des", "que", " la", "ion", "une", "par"],
    "es": ["de ", "la ", "que", "el ", "en ", "los", "ión", "una", "ado", "por"],
}


def token_count(col, pattern: str = r"\w+|[^\w\s]"):
    """BPE-ish token count: words + punctuation runs, pure SQL regexp."""
    return F.size(F.regexp_extract_all(col, F.lit(f"({pattern})"), 1))


def text_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punct/digit/space
    ratios, stopword share — single projection, no shuffle."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    words = F.split(normalize_text(txt), " ")
    n_words = F.size(words)
    stopwords = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        token_count(txt).alias("n_tokens"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 6).alias("avg_word_len"),
        F.round(
            F.length(F.regexp_replace(txt, r"[^\p{Punct}]", "")) / F.greatest(n_chars, F.lit(1)), 6
        ).alias("punct_ratio"),
        F.round(
            F.length(F.regexp_replace(txt, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)), 6
        ).alias("digit_ratio"),
        F.round(
            F.size(F.array_intersect(F.array_distinct(words), stop_arr))
            / F.greatest(F.size(F.array_distinct(words)), F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1)), 6
        ).alias("distinct_word_ratio"),
    )


def document_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                         k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min hash over each window of k-gram
    hashes, deduplicated — all array expressions, no UDF."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(words)
    grams = F.when(
        n >= k,
        F.transform(F.sequence(F.lit(0), n - k), lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, k)))),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", words))))
    docs_g = docs.select(F.col(id_col), grams.alias("g"))
    m = F.size(F.col("g"))
    mins = F.when(
        m >= window,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), m - window),
                lambda i: F.array_min(F.slice(F.col("g"), i + 1, window)),
            )
        ),
    ).otherwise(F.array(F.array_min(F.col("g"))))
    return docs_g.select(id_col, F.sort_array(mins).alias("fingerprint"))


_LANG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_score", T.DoubleType()),
    ]
)


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic n-gram language ID as a vectorized pandas UDF (mapInPandas):
    counts profile trigrams per language over lowercase text, batch-at-a-time.
    """
    profiles = dict(_LANG_PROFILES)

    def fn(batches):
        import re

        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            scores = {}
            for lang, grams in profiles.items():
                s = None
                for g in grams:
                    c = texts.str.count(re.escape(g))
                    s = c if s is None else s + c
                scores[lang] = s / texts.str.len().clip(lower=1)
            score_df = pd.DataFrame(scores)
            best = score_df.idxmax(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "lang_pred": best.to_numpy(),
                    "lang_score": score_df.max(axis=1).to_numpy(),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, _LANG_SCHEMA)
