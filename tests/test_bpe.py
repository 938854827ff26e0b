"""BPE tokenizer (functions/bpe.py): the three apply paths are one
algorithm, the trainer is deterministic, and both catalog faces match the
DuckDB oracle."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import SF_ORACLE, SF_SMOKE, duck_on_sf

from data_harvesting_spark.functions.bpe import (
    DEMO_MERGES,
    encode_text,
    encode_word,
    token_count_via_replace_chain,
    train_bpe_merges_from_freqs,
)

_RANKS = {tuple(m): i for i, m in enumerate(DEMO_MERGES)}

# text over the demo alphabet plus noise chars the normalizer strips
_texts = st.text(
    alphabet="abcdelmnoprstuw  .!7X",  # doubled space → empty-word edges
    max_size=80,
)


@given(_texts)
@settings(max_examples=300, deadline=None)
def test_greedy_encoder_equals_replace_chain(text):
    """The exactness argument (module docstring): greedy lowest-rank-first
    encoding and the rank-ordered nested-replace chain are the SAME
    function — on arbitrary inputs, not just corpus text. str.replace has
    the identical L2R non-overlapping semantics as SQL replace, so this
    pins the SQL/Column algebra without a Spark session in the loop."""
    assert len(encode_text(text, _RANKS)) == token_count_via_replace_chain(
        text, DEMO_MERGES
    )


@given(
    st.lists(
        st.tuples(st.text(alphabet="abcd", min_size=1, max_size=6),
                  st.integers(min_value=1, max_value=9)),
        max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_trained_merges_stay_exact_under_replace_chain(word_freqs):
    """Train on an arbitrary tiny corpus, then check the equivalence under
    the LEARNED table too (merges with multi-char symbols, nested merges)."""
    freqs: dict[str, int] = {}
    for w, f in word_freqs:
        freqs[w] = freqs.get(w, 0) + f
    merges = train_bpe_merges_from_freqs(freqs, num_merges=6, min_pair_count=1)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    corpus = " ".join(w for w, _ in word_freqs)
    assert len(encode_text(corpus, ranks)) == token_count_via_replace_chain(
        corpus, merges
    )


def test_trainer_merge_order_and_determinism():
    """Counts drive rank; ties break to the lexicographically smallest
    pair; merged symbols compound."""
    # 'abab'x3 + 'ab'x2: (a,b) count 8 dominates; then (ab,ab) count 3
    merges = train_bpe_merges_from_freqs({"abab": 3, "ab": 2}, num_merges=4)
    assert merges == [("a", "b"), ("ab", "ab")]
    # pure tie: in 'aba' both (a,b) and (b,a) count 2 → lexicographic win
    assert train_bpe_merges_from_freqs({"aba": 2}, num_merges=1) == [("a", "b")]
    # same input, same table — byte-deterministic
    assert train_bpe_merges_from_freqs(
        {"abab": 3, "ab": 2}
    ) == train_bpe_merges_from_freqs({"abab": 3, "ab": 2})


def test_encode_word_greedy_rank_order():
    """Lowest rank merges first even when a higher-rank pair appears
    earlier in the word."""
    ranks = {("b", "c"): 0, ("a", "bc"): 1, ("a", "b"): 2}
    assert encode_word("abc", ranks) == ("abc",)
    # without the (a,bc) merge the result stays split
    assert encode_word("abc", {("b", "c"): 0}) == ("a", "bc")


def test_demo_merges_are_the_sf0001_training_output(spark):
    """DEMO_MERGES is not hand-invented: it is exactly the first 16 merges
    the distributed trainer learns from the sf0.001 documents corpus."""
    from data_harvesting_spark.functions.bpe import train_bpe_merges

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert tuple(train_bpe_merges(docs, "text", num_merges=16)) == DEMO_MERGES


def test_udf_and_expr_paths_agree_on_corpus(spark):
    """The Arrow-batched pandas UDF (generic scale path) and the
    whole-stage-codegen nested-replace Column (small-table path) agree on
    every sf0.001 document."""
    from pyspark.sql import functions as F

    from data_harvesting_spark.functions.bpe import (
        bpe_encode_udf,
        bpe_token_count_expr,
        bpe_token_count_udf,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    both = docs.select(
        "doc_id",
        bpe_token_count_expr("text").alias("n_expr"),
        bpe_token_count_udf(DEMO_MERGES)(F.col("text")).alias("n_udf"),
        F.size(bpe_encode_udf(DEMO_MERGES)(F.col("text"))).alias("n_arr"),
    ).toPandas()
    assert (both.n_expr == both.n_udf).all()
    assert (both.n_expr == both.n_arr).all()


def test_bpe_catalog_queries_match_oracle(spark):
    """Both catalog faces (training corpus pass + apply) value-match the
    DuckDB oracle at the driver's sf."""
    from data_harvesting_spark.plans import catalog

    for name, keys in [
        ("bpe_pair_counts", ["a", "b"]),
        ("bpe_token_counts", ["doc_id"]),
    ]:
        got = (
            catalog.spark_queries()[name](spark, SF_ORACLE)
            .toPandas()
            .sort_values(keys)
            .reset_index(drop=True)
        )
        want = (
            duck_on_sf(catalog.oracle_queries()[name], SF_ORACLE)
            .sort_values(keys)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_bpe_token_counts_plan_is_pure_codegen(spark):
    """The apply face stays JVM-side: no Python eval node, no exchange —
    the token count rides the scan."""
    from data_harvesting_spark.plans import catalog

    df = catalog.spark_queries()["bpe_token_counts"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan
