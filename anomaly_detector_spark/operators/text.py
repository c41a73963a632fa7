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
# Character-frequency trigram profiles from published frequency lists
# (public knowledge; the standard Cavnar-Trenkle n-gram profile approach).
# Scripts with unambiguous Unicode ranges are decided by script ratio first.
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "to ", " of", "ed ", " a ", "is ", "at ",
           " th", "he ", "er ", " in", "nd ", "hat", "for", "as ", "his", "ere",
           "you", "ith", "ver", "all", "ted", "thi", " be", " wa", "ght", "oun"],
    "de": ["der", "die", "und", "ein", "ich", "sch", "en ", "ung", " zu", "cht",
           "den", "gen", " ge", "ver", "nde", " da", "ber", "ten", " mi", "ies",
           "cha", "ach", "sse", "auf", "ste", "ass", "eit", "nen", " we", "hen"],
    "fr": ["le ", "de ", "les", "ent", "des", "que", " la", "ion", "une", "par",
           " pa", "ait", "our", " qu", "ais", "eur", "ans", " co", "men", "tio",
           "on ", "nt ", " et", "re ", " le", "es ", "est", "ous", " un", "eme"],
    "es": ["de ", "la ", "que", "el ", "en ", "los", "ión", "una", "ado", "por",
           " co", "est", " es", "nte", " se", "con", "res", " de", "as ", "os ",
           "ien", "cio", " po", "ara", "ent", "aci", "dad", " su", "tra", "ndo"],
    "it": ["che", "di ", "la ", " di", "to ", "re ", "ion", "no ", "ell", " co",
           "per", "del", "con", "one", "zio", "ato", "nte", " pe", "gli", "ita"],
    "pt": ["de ", " de", "os ", "ão ", "que", " qu", "ent", "da ", " co", "em ",
           "ara", " pa", "do ", "ada", "nto", "om ", " se", "ment", "res", "uma"],
    "nl": ["en ", "de ", " de", "van", " va", "et ", "een", " ee", "er ", "ij ",
           "aar", "oor", " he", "sch", "cht", "ing", " ge", "ver", "ijk", "den"],
}

# (language, unicode character-class regex) for script-decidable languages;
# checked before the trigram vote, threshold on the matched-char ratio.
_SCRIPT_RANGES = [
    ("zh", "[一-鿿㐀-䶿]"),
    ("ja", "[぀-ゟ゠-ヿ]"),   # kana (CJK-only text -> zh)
    ("ko", "[가-힯ᄀ-ᇿ]"),
    ("ru", "[Ѐ-ӿ]"),
    ("ar", "[؀-ۿ]"),
    ("el", "[Ͱ-Ͽ]"),
    ("he", "[֐-׿]"),
]
_SCRIPT_THRESHOLD = 0.30


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
    """Heuristic language ID as a vectorized pandas UDF (mapInPandas).

    Two stages, both batch-vectorized (one compiled-regex pass per language,
    never per-row Python):
    1. script detection — languages with unambiguous Unicode ranges
       (zh/ja/ko/ru/ar/el/he) win outright when their script covers >=30% of
       the characters (kana presence distinguishes ja from zh);
    2. Cavnar-Trenkle-style trigram vote over the Latin profiles, scored as
       profile-hit density per character.
    A public-knowledge heuristic, not a trained classifier — intended for
    corpus slicing/quality gates, not ground truth.
    """
    profiles = dict(_LANG_PROFILES)
    script_ranges = list(_SCRIPT_RANGES)

    def fn(batches):
        import re

        # Lookahead alternation so overlapping hits at DIFFERENT start
        # positions all count (e.g. 'the' at i then 'he ' at i+1) — a plain
        # alternation counts only leftmost non-overlapping matches.  One hit
        # per start position: two grams starting at the same offset still
        # count once (fine for the equal-length trigram profiles used here).
        lang_regex = {
            lang: re.compile("(?=(" + "|".join(re.escape(g) for g in grams) + "))")
            for lang, grams in profiles.items()
        }
        script_regex = [(lang, re.compile(rng)) for lang, rng in script_ranges]
        for pdf in batches:
            texts = pdf[text_col].fillna("").str.lower()
            lens = texts.str.len().clip(lower=1)
            scores = {
                lang: texts.str.count(rx) / lens for lang, rx in lang_regex.items()
            }
            score_df = pd.DataFrame(scores)
            best = score_df.idxmax(axis=1)
            best_score = score_df.max(axis=1)
            # script override: highest-ratio script above threshold wins;
            # kana PRESENCE then overrides zh -> ja (formal Japanese is
            # kanji-heavy, so the kanji/CJK ratio alone would pick zh)
            script_scores = pd.DataFrame(
                {lang: texts.str.count(rx) / lens for lang, rx in script_regex}
            )
            top_script = script_scores.idxmax(axis=1)
            top_ratio = script_scores.max(axis=1)
            kana = script_scores["ja"] >= 0.05
            top_script = top_script.where(~((top_script == "zh") & kana), "ja")
            use_script = top_ratio >= _SCRIPT_THRESHOLD
            best = best.where(~use_script, top_script)
            best_score = best_score.where(~use_script, top_ratio)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "lang_pred": best.to_numpy(),
                    "lang_score": best_score.to_numpy(),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, _LANG_SCHEMA)
