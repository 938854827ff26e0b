"""Corpus-quality operators a training-data pipeline runs before export:
Gopher-style repetition signals and benchmark decontamination.

Reference analog: the per-frame condition gate (`/root/reference/condition.py:8-95`)
is the reference's only quality filter; these operators extend the same
"drop low-value samples before they reach the dataset" role to the text
corpus surface (repetitive documents, eval-set contamination), as published
in the Gopher/MassiveText filtering rules (Rae et al. 2021) and standard
LLM decontamination practice (n-gram overlap vs held-out benchmarks).

Scale posture:
- ``repetition_stats``: word stats run as a two-level hash aggregate
  (``(doc_id, word)`` then ``doc_id``) with map-side partial aggregation —
  shuffle volume is proportional to *distinct* words per doc, not corpus
  bytes. The bigram dup fraction is computed per-row with JVM higher-order
  functions (``zip_with``/``array_distinct``) before the explode, so it
  costs no extra shuffle and stays linear per document.
- ``contamination_stats``: the eval/benchmark shingle set is DISTINCT'd and
  **broadcast** (benchmarks are small by construction); the corpus side
  streams through one explode + hash aggregate keyed ``doc_id``. No
  shuffle touches the full corpus text twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from data_harvesting_spark.functions.text import normalize_text

# Per-row bigram list: zip the word array against itself shifted by one.
# Linear per document, JVM-side, no shuffle.
_BIGRAMS = (
    "CASE WHEN size(w) < 2 THEN array() "
    "ELSE zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1), "
    "(a, b) -> concat(a, ' ', b)) END"
)


def repetition_stats(
    docs: DataFrame,
    *,
    dup_word_max: float = 0.55,
    top_word_max: float = 0.12,
    dup_2gram_max: float = 0.05,
) -> DataFrame:
    """Per-document repetition signals over normalized whitespace words.

    Emits ``(doc_id, n_words, dup_word_frac, top_word_frac,
    dup_2gram_frac, repetitive)`` where

    - ``dup_word_frac``  = 1 − distinct_words / n_words,
    - ``top_word_frac``  = count(most frequent word) / n_words,
    - ``dup_2gram_frac`` = 1 − distinct_bigrams / n_bigrams (0.0 for
      single-word docs),
    - ``repetitive``     = any signal above its threshold.

    Fractions are rounded to 6 places (cross-engine float parity).
    """
    base = docs.select(
        "doc_id",
        F.split(normalize_text("text"), " ").alias("w"),
    ).select(
        "doc_id",
        "w",
        F.when(
            F.expr("size(w) < 2"), F.lit(0.0)
        ).otherwise(
            F.round(
                F.lit(1.0)
                - F.expr(f"size(array_distinct({_BIGRAMS}))")
                / F.expr("cast(size(w) - 1 as double)"),
                6,
            )
        ).alias("dup_2gram_frac"),
    )

    exploded = base.select("doc_id", "dup_2gram_frac", F.explode("w").alias("word"))
    word_counts = exploded.groupBy("doc_id", "word").agg(
        F.count("*").alias("c"),
        F.first("dup_2gram_frac").alias("dup_2gram_frac"),
    )
    stats = word_counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_words"),
        F.count("*").alias("distinct_words"),
        F.max("c").alias("top_cnt"),
        F.first("dup_2gram_frac").alias("dup_2gram_frac"),
    )

    dup_word = F.round(F.lit(1.0) - F.col("distinct_words") / F.col("n_words"), 6)
    top_word = F.round(F.col("top_cnt") / F.col("n_words"), 6)
    return stats.select(
        "doc_id",
        "n_words",
        dup_word.alias("dup_word_frac"),
        top_word.alias("top_word_frac"),
        "dup_2gram_frac",
        (
            (dup_word > dup_word_max)
            | (top_word > top_word_max)
            | (F.col("dup_2gram_frac") > dup_2gram_max)
        ).alias("repetitive"),
    )


# Word-3-gram shingles as an array column; empty for docs under 3 words
# (sequence(0, n) with negative n would run DESCENDING in Spark — the CASE
# guard is load-bearing, not cosmetic).
_SHINGLES = (
    "CASE WHEN size(w) < 3 THEN array() "
    "ELSE array_distinct(transform(sequence(0, size(w)-3), "
    "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) END"
)


def contamination_stats(
    docs: DataFrame,
    *,
    eval_mod: int = 97,
    threshold: float = 0.02,
) -> DataFrame:
    """Benchmark-decontamination check: for every corpus document, the
    fraction of its distinct word-3-gram shingles that also occur in the
    held-out eval split (``doc_id % eval_mod == 0`` — a deterministic
    stand-in for a real benchmark table).

    Emits ``(doc_id, n_shingles, n_overlap, overlap_frac, contaminated)``
    for corpus (non-eval) documents; docs with fewer than 3 words get
    ``overlap_frac = 0.0``. The eval shingle set is broadcast — at 100 TB
    the corpus side never shuffles its text, only ``(doc_id, shingle)``
    pairs into one hash aggregate.
    """
    shingled = docs.select(
        "doc_id", F.split(normalize_text("text"), " ").alias("w")
    ).select("doc_id", F.expr(_SHINGLES).alias("sh"))

    eval_sh = (
        shingled.filter(F.col("doc_id") % eval_mod == 0)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )

    corpus = (
        shingled.filter(F.col("doc_id") % eval_mod != 0)
        .select("doc_id", F.explode_outer("sh").alias("shingle"))
        .join(F.broadcast(eval_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").cast("bigint").alias("n_shingles"),
            F.count("hit").cast("bigint").alias("n_overlap"),
        )
    )

    frac = F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6)
    )
    return corpus.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        frac.alias("overlap_frac"),
        (frac >= threshold).alias("contaminated"),
    )
