"""Round-3 export/sampling catalog additions: DPO preference pairs,
percentile length-band filter, exact-k per-group sampling — oracle parity,
plan shape, and semantic invariants."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_ORACLE, duck_on_sf


def _oracle_parity(spark, name, sort_keys):
    from data_harvesting_spark.plans import catalog

    df = catalog.spark_queries()[name](spark, SF_ORACLE)
    # capture the plan pre-execution: after execution AQE's toString()
    # prints Final Plan + Initial Plan and doubles every node count
    plan = df._jdf.queryExecution().executedPlan().toString()
    got = df.toPandas().sort_values(sort_keys).reset_index(drop=True)
    want = (
        duck_on_sf(catalog.oracle_queries()[name], SF_ORACLE)
        .sort_values(sort_keys)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    return plan, got


def test_derivation_value_variant_consistent():
    """The reward-carrying transcript derivation is the base derivation
    plus one column — the shared rules can never drift between the two."""
    from data_harvesting_spark.derive import (
        transcripts_sql,
        transcripts_with_value_sql,
    )

    base = duck_on_sf(transcripts_sql("events"), SF_ORACLE)
    withv = duck_on_sf(transcripts_with_value_sql("events"), SF_ORACLE)
    assert list(withv.columns) == list(base.columns[:-1]) + ["value", "ts"]
    keys = ["conv_id", "turn_idx"]
    b = base.sort_values(keys).reset_index(drop=True)
    v = withv[base.columns].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(b, v)
    assert withv["value"].notna().any()


def test_dpo_pairs_oracle_plan_and_semantics(spark):
    """DPO extraction matches the windowed oracle; the Spark plan is the
    join-free min_by/max_by form: exactly 2 exchanges (conv_id derivation
    + tool aggregation), partial aggregation map-side, no join operator."""
    plan, got = _oracle_parity(spark, "dpo_pairs", ["tool"])
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_min_by" in plan and "partial_max_by" in plan, plan
    assert "Join" not in plan, plan

    assert len(got) > 0
    assert got["tool"].is_unique
    assert (got["chosen_reward"] > got["rejected_reward"]).all()
    assert (
        (got["chosen_conv"] != got["rejected_conv"])
        | (got["chosen_turn"] != got["rejected_turn"])
    ).all()
    # candidates are wrap-up turns: the turn after a tool response
    assert (got["chosen_turn"] % 4 == 3).all()
    assert (got["rejected_turn"] % 4 == 3).all()


def test_doc_length_band_oracle_plan_and_semantics(spark):
    """[p5, p95] per-language length band matches the percent_rank oracle
    WITHOUT any per-lang sort of the data (round-4 scale path): ranks come
    from the distinct-(lang, n_chars) count table, the kept interval
    broadcast-joins back, and the plan has no percent_rank window, no
    single-partition stage, and both hash exchanges carry only the tiny
    distinct-lengths side. Each language's global min/max lengths are
    dropped whenever the language has enough distinct lengths to have
    tails at all."""
    plan, got = _oracle_parity(spark, "doc_length_band", ["doc_id"])
    assert "percent_rank" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan

    full = duck_on_sf(
        "SELECT doc_id, lang, n_chars FROM documents", SF_ORACLE
    )
    assert 0 < len(got) < len(full)
    for lang, grp in full.groupby("lang"):
        kept = got[got["lang"] == lang]["n_chars"]
        if len(grp) >= 40 and grp["n_chars"].nunique() >= 40:
            assert kept.min() > grp["n_chars"].min()
            assert kept.max() < grp["n_chars"].max()


def test_group_sample_k_oracle_plan_and_semantics(spark):
    """Exact-k per-group sample matches the md5-rank oracle and yields
    exactly min(k, group size) rows per language with rn = 1..k; the
    selection is a fixed subset — re-running yields the identical
    doc_id set."""
    plan, got = _oracle_parity(spark, "group_sample_k", ["lang", "rn"])
    # round-4 scale path: per-(lang, bucket) counts prune every bucket
    # that can't hold a top-k row BEFORE any sort; no single-partition
    # stage, the full-language sort is gone (the only data-side exchange
    # carries broadcast-join survivors, ~k + one bucket per lang)
    assert "Exchange SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan

    sizes = duck_on_sf(
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang", SF_ORACLE
    ).set_index("lang")["n"]
    for lang, grp in got.groupby("lang"):
        expect = min(50, int(sizes[lang]))
        assert len(grp) == expect
        assert sorted(grp["rn"]) == list(range(1, expect + 1))

    from data_harvesting_spark.plans import catalog

    again = (
        catalog.spark_queries()["group_sample_k"](spark, SF_ORACLE)
        .toPandas()
        .sort_values(["lang", "rn"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_dataset_mix_oracle_plan_and_semantics(spark):
    """Mix-weight upsampling matches the generate_series oracle with ZERO
    exchanges (a generated-column flatmap riding the scan); en docs appear
    once, every other language exactly 3 times with epoch_idx 1..3."""
    plan, got = _oracle_parity(spark, "dataset_mix", ["doc_id", "epoch_idx"])
    assert "Exchange" not in plan, plan

    per_doc = got.groupby(["doc_id", "lang"])["epoch_idx"].agg(["count", "max"])
    en = per_doc.xs("en", level="lang", drop_level=False)
    rest = per_doc.drop(en.index)
    assert (en["count"] == 1).all() and (en["max"] == 1).all()
    assert (rest["count"] == 3).all() and (rest["max"] == 3).all()


def test_shuffle_order_oracle_plan_and_semantics(spark):
    """Distributed global dense rank matches the single-window oracle:
    positions are exactly 1..n with no gaps, the plan has no unbounded
    single-partition stage (the only SinglePartition exchange feeds the
    256-row bucket-offset window), and the big side moves through one
    bucket hash exchange + a broadcast join."""
    plan, got = _oracle_parity(spark, "shuffle_order", ["doc_id"])
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # the one SinglePartition exchange carries only the 256 bucket counts
    assert plan.count("Exchange SinglePartition") == 1, plan

    n = len(got)
    assert sorted(got["shuffle_pos"]) == list(range(1, n + 1))
    # permutation is hash-driven, not storage order
    by_doc = got.sort_values("doc_id")["shuffle_pos"].tolist()
    assert by_doc != sorted(by_doc)


def test_sequence_pack_oracle_and_plan(spark):
    """Sequence packing matches the global-running-sum oracle while
    computing the running sum DISTRIBUTED (round-4 scale path): the only
    single-partition stage is the <=257-row shard-offset window, the big
    side moves through one shard hash exchange plus a broadcast join —
    the shuffle_order pattern applied to an ordered prefix sum."""
    plan, got = _oracle_parity(spark, "sequence_pack", ["doc_id"])
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    # Four hash exchanges since the r5 hot-shard auto-split: ONE carries
    # the full-width big side into the within-shard window; the other
    # three are post-partial-agg probe shuffles bounded by the shard
    # count (the nsub row-count probe — once per subtree since the
    # offsets branch re-derives the sharding — and the per-(shard, sub)
    # token aggregate feeding the broadcast offsets).
    assert plan.count("Exchange hashpartitioning") == 4, plan

    # the tiling is gap-free across shard boundaries (the exact property
    # a wrong shard offset would break)
    s = got.sort_values("doc_id")
    starts, toks = s["start_tok"].to_numpy(), s["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert (starts[1:] == starts[:-1] + toks[:-1]).all()


def test_export_queries_degenerate_inputs(spark, tmp_path):
    """Empty tables: every new export/sampling query returns an empty
    result cleanly. One-row tables: the sampling ops keep the row, the
    band gate drops it (percent_rank 0 < p5 — a 1-doc language has only
    tail), and DPO finds no pair to prefer."""
    from data_harvesting_spark.plans import catalog

    from tests.conftest import SF_SMOKE

    for table in ("documents", "events"):
        full = spark.read.parquet(f"{SF_SMOKE}/{table}.parquet")
        full.limit(0).write.parquet(str(tmp_path / "empty" / f"{table}.parquet"))
        full.limit(1).write.parquet(str(tmp_path / "one" / f"{table}.parquet"))

    qs = catalog.spark_queries()
    new = ["dpo_pairs", "doc_length_band", "group_sample_k",
           "dataset_mix", "shuffle_order", "sequence_pack"]
    for name in new:
        assert qs[name](spark, str(tmp_path / "empty")).count() == 0, name

    one = str(tmp_path / "one")
    assert qs["group_sample_k"](spark, one).count() == 1
    assert qs["shuffle_order"](spark, one).toPandas()["shuffle_pos"].tolist() == [1]
    assert qs["dataset_mix"](spark, one).count() in (1, 3)
    assert qs["doc_length_band"](spark, one).count() == 0
    assert qs["dpo_pairs"](spark, one).count() == 0


def test_embedding_elbow_k_oracle_and_semantics(spark):
    """The elbow k-selection anchor: the real cluster_groups elbow kernel
    against the closed-form inertia-curve + chord-rule oracle. All three
    fixture regimes appear and land on their designed k: constant and
    two-point groups at k=1 (degenerate guard / endpoint-only range),
    three-blob groups at the k=2 knee."""
    plan, got = _oracle_parity(spark, "embedding_elbow_k", ["grp"])
    ks = got.set_index(got["grp"].astype(int))["chosen_k"]
    assert set(got["chosen_k"]) == {1, 2}
    assert (ks[ks.index % 3 == 0] == 1).all()  # constant regime
    assert (ks[ks.index % 3 == 1] == 1).all()  # two-point regime
    assert (ks[ks.index % 3 == 2] == 2).all()  # three-blob regime


def test_doc_lm_score_oracle_plan_and_semantics(spark):
    """Perplexity-proxy score matches the oracle; the vocabulary join is
    broadcast (plan-asserted); rarer-token docs score higher."""
    plan, got = _oracle_parity(spark, "doc_lm_score", ["doc_id"])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert (got["lm_score"] > 0).all()
    # sanity: scores vary across docs (a constant score would mean the
    # join degenerated) and every scored doc counted its tokens
    assert got["lm_score"].nunique() > 1
    assert (got["n_tokens"] > 0).all()


def test_doc_chunks_oracle_plan_and_semantics(spark):
    """Chunking matches the oracle; zero exchange (rides the scan); the
    chunk layout tiles each document: first chunk starts at word 1,
    consecutive chunks overlap by exactly chunk_words - stride when full,
    and the last chunk ends at the document's final word."""
    import pandas as pd

    plan, got = _oracle_parity(spark, "doc_chunks", ["doc_id", "chunk_idx"])
    assert "Exchange" not in plan
    # per-doc layout invariants (64/48)
    duck = duck_on_sf(
        "SELECT doc_id, len(string_split(trim(regexp_replace(regexp_replace("
        "lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS n "
        "FROM documents WHERE length(trim(text)) > 0",
        SF_ORACLE,
    ).set_index("doc_id")["n"]
    for doc_id, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        n = int(duck.loc[doc_id])
        assert list(grp["chunk_idx"]) == list(range(len(grp)))
        # every chunk but the last is full; coverage reaches the last word
        assert (grp["n_words"].iloc[:-1] == 64).all()
        last_start = (len(grp) - 1) * 48
        assert last_start + grp["n_words"].iloc[-1] == n
        # reassembling stride-prefixes + the last chunk = the document
        words = []
        for _, r in grp.iterrows():
            cw = r["chunk_text"].split(" ")
            words.extend(cw[:48] if r["chunk_idx"] < len(grp) - 1 else cw)
        assert len(words) == n


def test_chunk_documents_degenerate_inputs(spark):
    """Empty text and single-word docs: no empty chunks, no crash; a doc
    shorter than one chunk yields exactly one chunk."""
    from data_harvesting_spark.operators.quality import chunk_documents

    pdf = spark.createDataFrame(
        [(1, "one two three"), (2, ""), (3, "   "), (4, "solo"), (5, None)],
        "doc_id long, text string",
    )
    got = chunk_documents(pdf, chunk_words=64, stride=48).toPandas()
    assert set(got["doc_id"]) == {1, 4}
    assert (got["chunk_idx"] == 0).all()
    assert got.set_index("doc_id")["chunk_text"].to_dict() == {
        1: "one two three", 4: "solo"
    }


def test_semantic_dedup_oracle_and_semantics(spark):
    """SemDeDup-style kept-set matches the oracle; every dropped vector
    has a smaller-id cell-mate within threshold (verified against the
    exact all-pairs cosine table); kept ids are a subset of the corpus
    with at least one survivor per cell."""
    plan, got = _oracle_parity(spark, "semantic_dedup", ["vec_id"])
    # the pair stage must be a same-cell equi-join, not a nested loop
    assert "BroadcastNestedLoopJoin" not in plan
    all_ids = duck_on_sf("SELECT vec_id FROM embeddings", SF_ORACLE)
    assert set(got["vec_id"]) <= set(all_ids["vec_id"])
    assert len(got) > 0
    # dropped = ids absent from the kept set; each must have a smaller-id
    # mate in the SAME cell with cosine >= 0.45 per the exact table
    # anchor budget mirrors the implementation's corpus-derived rule
    # (r5: n_anchors = ceil(n / 64) on the %37 residue grid)
    n_corpus = len(all_ids)
    max_aid = 37 * -(-n_corpus // 64)
    cells = duck_on_sf(
        f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        anchors AS (SELECT vec_id aid, v av FROM e
                    WHERE vec_id % 37 = 0 AND vec_id < {max_aid})
        SELECT vec_id, aid AS cell FROM (
          SELECT e.vec_id, a.aid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY list_cosine_similarity(e.v, a.av) DESC, a.aid ASC) rn
          FROM e CROSS JOIN anchors a) t WHERE rn = 1
        """,
        SF_ORACLE,
    ).set_index("vec_id")["cell"]
    pairs = duck_on_sf(
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
        SELECT a.vec_id va, b.vec_id vb
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.45
        """,
        SF_ORACLE,
    )
    dropped = set(all_ids["vec_id"]) - set(got["vec_id"])
    assert dropped, "fixture should contain within-cell near-dups"
    mates = pairs.groupby("vb")["va"].apply(set)
    for vid in dropped:
        assert any(
            cells.loc[m] == cells.loc[vid] for m in mates.get(vid, set())
        ), f"{vid} dropped without a same-cell smaller-id near-dup"
    # survivors-per-cell: the smallest id of every cell is always kept
    smallest = cells.reset_index().groupby("cell")["vec_id"].min()
    assert set(smallest) <= set(got["vec_id"])


def test_doc_badwords_oracle_and_semantics(spark):
    """Blocklist gate matches the oracle; zero exchange (rides the scan);
    both branches populated; whole-word matching only (the common word
    'slow' counts, but no substring of a longer word does)."""
    plan, got = _oracle_parity(spark, "doc_badwords", ["doc_id"])
    assert "Exchange" not in plan
    assert got["flagged"].any() and (~got["flagged"]).any()
    assert (got["n_blocked"] >= 0).all()
    from data_harvesting_spark.functions.text import blocklist_hits

    pdf = spark.createDataFrame(
        [(1, "slow query"), (2, "slowest query"), (3, "dup dup Dup")],
        "doc_id long, text string",
    ).select("doc_id", blocklist_hits("text").alias("n")).toPandas()
    assert pdf.set_index("doc_id")["n"].to_dict() == {1: 1, 2: 0, 3: 3}


def test_doc_lm_score_bigram_oracle_and_semantics(spark):
    """Bigram conditional score matches the oracle; model tables join
    broadcast; a repetitive doc (high bigram predictability) scores lower
    than under the unigram model relative to corpus mean."""
    plan, got = _oracle_parity(spark, "doc_lm_score_bigram", ["doc_id"])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert (got["lm_bigram_score"] > 0).all()
    assert got["lm_bigram_score"].nunique() > 1
    # conditional model: every scored doc has >= 1 bigram (>= 2 tokens)
    assert (got["n_bigrams"] >= 1).all()


def test_ann_pq_topk_oracle_and_recall(spark):
    """PQ-ADC matches the oracle end to end (codes, quantized distance
    tables, ranks); recall@5 vs the exact cosine brute force is sane for
    a 4x16 codebook quantization; scoring joins are broadcast."""
    plan, got = _oracle_parity(spark, "ann_pq_topk", ["query_id", "rank"])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert got.groupby("query_id")["rank"].apply(
        lambda r: list(r) == list(range(1, len(r) + 1))
    ).all()
    # recall vs exact L2 top-5 (PQ approximates L2, not cosine)
    exact = duck_on_sf(
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings)
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id query_id, x.vec_id neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_distance(q.v, x.v) ASC, x.vec_id ASC) rn
          FROM e q JOIN e x ON x.vec_id <> q.vec_id
          WHERE q.vec_id % 50 = 0) t WHERE rn <= 5
        """,
        SF_ORACLE,
    )
    hits = got.merge(exact, on=["query_id", "neighbor_id"])
    recall = len(hits) / len(exact)
    assert recall >= 0.2, f"PQ recall@5 collapsed: {recall}"


def test_ann_ivfpq_topk_oracle_and_containment(spark):
    """IVF-PQ matches the oracle; every returned neighbor is a member of
    a probed cell (candidate containment in the IVF path's candidate
    set); scoring joins are broadcast."""
    plan, got = _oracle_parity(spark, "ann_ivfpq_topk", ["query_id", "rank"])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    ivf_cand = duck_on_sf(
        """
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        anchors AS (SELECT vec_id aid, v av FROM e WHERE vec_id % 37 = 0 AND vec_id < 2368),
        assigned AS (
          SELECT vec_id, aid AS cell FROM (
            SELECT e.vec_id, a.aid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.v, a.av) DESC, a.aid ASC) rn
            FROM e CROSS JOIN anchors a) t WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, aid AS cell FROM (
            SELECT e.vec_id, a.aid, ROW_NUMBER() OVER (PARTITION BY e.vec_id
              ORDER BY list_cosine_similarity(e.v, a.av) DESC, a.aid ASC) rn
            FROM e CROSS JOIN anchors a WHERE e.vec_id % 50 = 0) t WHERE rn <= 4)
        SELECT DISTINCT p.query_id, s.vec_id AS neighbor_id
        FROM probes p JOIN assigned s ON p.cell = s.cell
        WHERE s.vec_id <> p.query_id
        """,
        SF_ORACLE,
    )
    cand = set(map(tuple, ivf_cand[["query_id", "neighbor_id"]].values))
    assert all(
        (q, n) in cand
        for q, n in got[["query_id", "neighbor_id"]].values
    )
