"""Deduplication family over the ``documents`` table — the training-data
pipeline surface (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

The reference's only dedup is the greedy bbox near-dup removal
(`/root/reference/condition.py:63-77`); the graft generalizes it to the
standard large-corpus text-dedup toolbox.

Scale design notes (100 TB posture):
- exact: group by 64-bit hash of normalized text, never by the text itself —
  the shuffle carries 8 bytes + doc_id per row instead of the document.
- MinHash: signatures are computed per-row from shingle hashes
  (xxhash64 JVM-side, no Python), then LSH bands turn the O(n²) pair
  problem into equi-joins on (band, signature) buckets; only bucketed
  candidates get verified.
- the ``hash_mode="md5"`` variants are the DuckDB-oracle-portable ids
  (first 60 md5 bits — a per-row expression in both engines, no barrier);
  ``"rank"`` (dense_rank ids, global sort) survives only in the
  cross-mode soundness test. Default is ``xxhash64`` (cheaper hash).
- n-gram Jaccard self-join filters top-frequency shingles (stopword
  shingles explode candidate counts quadratically) — same reason MinHash
  exists at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_harvesting_spark.functions.text import normalize_text

# Fixed, seed-derived MinHash parameters (universal hashing
# h_i(x) = (a_i * x + b_i) mod p). Deterministic across engines and runs.
MINHASH_PRIME = 2147483647  # 2^31 - 1
_A = [1103, 12289, 52361, 75253, 104729, 130363, 174763, 224737,
      350377, 499979, 611953, 756839, 859433, 941083, 982451, 1299709]
_B = [12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012,
      90123, 13579, 24680, 35791, 46802, 57913, 68024, 79135]
N_HASHES = 16
BANDS = 4  # 4 bands × 4 rows


def normalize_docs(documents: DataFrame) -> DataFrame:
    return documents.withColumn("norm_text", normalize_text("text"))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per normalized-text hash group."""
    d = normalize_docs(documents).withColumn("h", F.xxhash64("norm_text"))
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "h", "norm_text")
    )


def word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the normalized text.

    Built entirely in-row: ``transform`` over word positions builds the
    n-grams and ``array_distinct`` dedups them BEFORE the explode — a
    (doc_id, shingle) duplicate can only occur within one document, so
    per-row dedup is exact and the plan needs ZERO exchanges (the old
    posexplode + window-lead + cross-row distinct formulation shuffled
    and sorted the whole exploded words table twice). Every shingle
    consumer (MinHash/LSH, Jaccard, SimHash, incremental dedup, HLL)
    inherits the saving; at 100 TB the exploded words table is ~10× the
    corpus, so these were the largest avoidable shuffles in the family.
    """
    # project the words array FIRST: split() referenced repeatedly inside
    # the Generate expression is re-evaluated per reference (no CSE inside
    # the generator) — measured 3× slower without this projection
    d = normalize_docs(documents).select(
        "doc_id", F.split("norm_text", " ").alias("_words")
    )
    words = F.col("_words")
    if n == 1:  # unigram shingles: the distinct words themselves
        arr = F.array_distinct(words)
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
        # sequence(1, k) is DESCENDING for k < 1 — guard short docs
        arr = F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
            F.slice(words, 1, 0)
        )
    return d.select("doc_id", F.explode(arr).alias("shingle"))


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Pairwise n-gram Jaccard similarity ≥ threshold (a < b).

    ``max_shingle_freq`` drops shingles shared by more than k docs before
    the self-join (candidate-explosion guard at scale); None = exact.
    """
    sh = word_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    if max_shingle_freq:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_shingle_freq), "shingle")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "sz_a", "sz_b",
                F.round("jaccard", 6).alias("jaccard"))
    )


def _shingle_ids(sh: DataFrame, mode: str) -> DataFrame:
    """shingle → non-negative int64 id bounded under MINHASH_PRIME (so the
    affine mix ``(sid*a + b) % p`` never overflows int64).

    - 'xxhash64': scale path — pure JVM expression, not reproducible in
      DuckDB (no xxhash64 there).
    - 'md5': engine-PORTABLE **and** barrier-free — first 60 md5 bits,
      identical SQL in DuckDB (`CAST('0x'||substr(md5(s),1,15) AS
      BIGINT)`), still a per-row expression. The oracle-matched default.
    - 'rank': legacy portable ids via global dense_rank (sort barrier);
      kept for the cross-mode soundness test.
    """
    if mode == "xxhash64":
        return sh.withColumn("sid", F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_PRIME)))
    if mode == "md5":
        return sh.withColumn(
            "sid",
            F.pmod(
                F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint"),
                F.lit(MINHASH_PRIME),
            ),
        )
    ids = sh.select("shingle").distinct().withColumn(
        "sid", F.dense_rank().over(Window.orderBy("shingle")).cast("bigint")
    )
    return sh.join(ids, "shingle")


def minhash_signatures(
    documents: DataFrame, n: int = 3, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc_id, sig: array<bigint> of N_HASHES minhash values)."""
    sh = _shingle_ids(word_shingles(documents, n), hash_mode)
    aggs = [
        F.min((F.col("sid") * a + b) % MINHASH_PRIME).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(_A[:N_HASHES], _B[:N_HASHES]))
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"mh{i}" for i in range(N_HASHES)]).alias("sig")
    )


def bands_of_signatures(sig: DataFrame) -> DataFrame:
    """(doc_id, band, band_sig) from a (doc_id, sig) signature table —
    the banding step alone, reusable over PERSISTED signatures (the
    incremental/streaming components index never re-reads document
    text)."""
    r = N_HASHES // BANDS
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.concat_ws("-", *[F.col("sig")[band * r + j].cast("string")
                                   for j in range(r)])
                for band in range(BANDS)
            ])
        ).alias("band", "band_sig"),
    )


def minhash_bands(
    documents: DataFrame, n: int = 3, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(doc_id, band, band_sig) — the LSH banding of the MinHash signature
    (BANDS bands × N_HASHES/BANDS rows). Shared by the pair finder and the
    bucket-representative dedup."""
    return bands_of_signatures(minhash_signatures(documents, n, hash_mode))


def minhash_sig_pairs(
    sig: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b) decided ENTIRELY from minhash
    signatures: band-bucket candidates, then signature-estimated Jaccard
    (fraction of agreeing minhash positions) ≥ ``threshold``.

    This is the edge rule the incremental/streaming duplicate-cluster
    maintenance uses: unlike exact-shingle verification it needs only
    the bounded-width signature index — no re-read of document text for
    corpus-side candidates — and it is deterministic and order-free, so
    the stream over any epoch split equals the batch over the union.
    """
    cand = band_candidates(bands_of_signatures(sig))
    return sig_verify_pairs(cand, sig, threshold)


def band_candidates(
    bands: DataFrame, other: DataFrame | None = None
) -> DataFrame:
    """Distinct id-ordered (doc_a < doc_b) candidate pairs from band-
    bucket collisions — THE single definition of the banding edge rule,
    shared by ``minhash_sig_pairs`` and the streaming incremental-
    components job (new-vs-new and new-vs-prior legs alike), so a change
    to the collision predicate cannot drift between batch and stream.

    One frame: self-join within ``bands``. Two frames: cross collisions
    between ``bands`` and ``other`` (pairs ordered by least/greatest)."""
    a = bands.alias("a")
    if other is None:
        pairs = a.join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    else:
        pairs = a.join(
            other.alias("p"),
            (F.col("a.band") == F.col("p.band"))
            & (F.col("a.band_sig") == F.col("p.band_sig"))
            & (F.col("a.doc_id") != F.col("p.doc_id")),
        ).select(
            F.least("a.doc_id", "p.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "p.doc_id").alias("doc_b"),
        )
    return pairs.distinct()


def sig_verify_pairs(
    cand: DataFrame, sig: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Filter candidate (doc_a, doc_b) pairs by signature-estimated
    Jaccard ≥ ``threshold`` (fraction of agreeing minhash positions).
    Shared verify stage of `minhash_sig_pairs` and the streaming
    incremental-components job (which generates delta candidates
    itself)."""
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(N_HASHES)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", agree)
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard"))
    )


def lsh_bucket_dedup(
    df: DataFrame, order_cols: list[str], text_col: str = "text", n: int = 3
) -> DataFrame:
    """Bucket-representative near-dedup: keep a row iff it is the
    first-ordered member of EVERY MinHash band bucket it falls into.

    ``order_cols`` must be a unique, arrival-consistent total order (e.g.
    ``["ts", "conv_id", "turn_idx"]``); the struct over them doubles as
    the row key, so bucket "first" is just ``min(struct)``. Rows whose
    text yields no shingles (< n words) have no buckets and are kept.

    This is the standard streaming-friendly LSH-dedup approximation: no
    candidate verification, each band bucket keeps one representative —
    near-duplicates (high Jaccard ⇒ some band collides w.h.p.) drop;
    the false-positive rate is the band-collision rate. The pair-finding
    path with exact verification stays ``minhash_lsh_pairs``.

    Scale: one shuffle keyed (band, band_sig) for the window min plus the
    key anti-join — work ∝ rows × BANDS, never O(n²).
    """
    keyed = df.withColumn("_k", F.struct(*order_cols))
    docs = keyed.select(F.col("_k").alias("doc_id"), F.col(text_col).alias("text"))
    bands = minhash_bands(docs, n)
    w = Window.partitionBy("band", "band_sig")
    losers = (
        bands.withColumn("_min", F.min("doc_id").over(w))
        .where(F.col("doc_id") > F.col("_min"))
        .select(F.col("doc_id").alias("_k"))
        .distinct()
    )
    return keyed.join(losers, "_k", "left_anti").drop("_k")


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures → bucket equi-join →
    exact-Jaccard verification of bucketed candidates only."""
    bands = minhash_bands(documents, n, hash_mode)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify ONLY bucketed candidates (work ∝ candidates, never O(n²) —
    # the whole point of LSH): intersection size via two candidate-side
    # equi-joins against the shingle set, then exact Jaccard.
    sh = word_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("sz").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(
    documents: DataFrame, bits: int = 64, hash_mode: str = "xxhash64"
) -> DataFrame:
    """SimHash fingerprint per doc: sign-aggregated token-hash bits.

    JVM-side: explode tokens, hash, per-bit ±1 vote via bit arithmetic,
    reassemble. ``hash_mode='xxhash64'`` is the scale path;
    ``'md5'`` (first 60 md5 bits mod p) is engine-portable for the DuckDB
    oracle AND barrier-free — a per-row expression like xxhash64;
    ``'rank'`` (dense_rank token ids mixed with ``(wid*a+b) % p``) is the
    legacy portable mode with a global sort barrier. With md5/rank modes
    use ``bits <= 31`` (the hash stays under 2^31).
    """
    toks = normalize_docs(documents).select(
        "doc_id", F.explode(F.split("norm_text", " ")).alias("w")
    )
    if hash_mode == "xxhash64":
        toks = toks.withColumn("h", F.xxhash64("w"))
    elif hash_mode == "md5":
        toks = toks.withColumn(
            "h",
            F.pmod(
                F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("bigint"),
                F.lit(MINHASH_PRIME),
            ),
        )
    else:
        ids = toks.select("w").distinct().withColumn(
            "wid", F.dense_rank().over(Window.orderBy("w")).cast("bigint")
        )
        toks = toks.join(ids, "w").withColumn(
            "h", (F.col("wid") * _A[0] + _B[0]) % MINHASH_PRIME
        )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        term = bit * F.lit(2 ** j).cast("bigint") if j < 63 else bit * F.lit(-(2 ** 63))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(documents: DataFrame, max_hamming: int = 8,
                       bits: int = 64, hash_mode: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Scale path: block on bit-chunks (pigeonhole — any pair within distance
    d shares at least one of d+1 chunks) instead of the full cross join.
    """
    fp = simhash64(documents, bits, hash_mode)
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    chunks = fp.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1))
            for i in range(n_chunks)
        ])).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("a.simhash").alias("ha"),
                F.col("b.doc_id").alias("doc_b"), F.col("b.simhash").alias("hb"))
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


def fingerprint_rank(
    documents: DataFrame, k: int = 8, n: int = 3, hash_mode: str = "md5"
) -> DataFrame:
    """Engine-portable winnowing-style fingerprint: the ``k``
    lexicographically-smallest mixed shingle hashes, joined into a string.

    Default shingle ids via the portable md5 expression (barrier-free,
    identical in DuckDB), mixed with ``(sid*a+b) % p``; 'rank' (global
    dense_rank, sort barrier) kept as the legacy mode. The scale path is
    the pure JVM ``functions.text.fingerprint`` (xxhash64). Docs with
    fewer than ``n`` words have no shingles → NULL fp (both engines).
    """
    sh = _shingle_ids(word_shingles(documents, n), hash_mode)
    fps = (
        sh.withColumn("hv", (F.col("sid") * _A[1] + _B[1]) % MINHASH_PRIME)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "-",
                F.transform(
                    F.slice(F.array_sort(F.collect_list("hv")), 1, k),
                    lambda x: x.cast("string"),
                ),
            ).alias("fp")
        )
    )
    return documents.select("doc_id").join(fps, "doc_id", "left")


# ---------------------------------------------------------------------------
# Duplicate clusters: pair list → transitive closure → keep-set.
#
# Every pair-finder above emits near-dup PAIRS; a production dedup pipeline
# then needs the duplicate CLUSTERS (a~b and b~c ⇒ {a,b,c} is one group,
# keep exactly one). That transitive-closure step is connected components
# over the pair graph — at 100 TB it cannot be a driver-side union-find, so
# it runs as the alternating large-star/small-star MapReduce algorithm
# (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
# O(log² n) worst-case rounds (O(log n) observed), each round two
# shuffle-keyed group-min joins — never all-pairs, never driver-resident.
# Skewed high-degree hubs are handled BY the algorithm: large-star re-roots
# a hub's edges onto its minimum neighbor, splitting the hub's bucket.


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node that appears in ``edges``;
    ``component`` is the minimum node id reachable from it (undirected).

    Alternating large-star / small-star min-label propagation; converges
    to one star per component centered at its minimum node. Convergence is
    detected EXACTLY (``new ⊆ old`` via exceptAll + equal counts — no
    checksum-collision risk); each iteration is localCheckpoint'ed so the
    logical plan stays O(1) deep instead of O(iterations).

    Reference analog: the tracker's persistent grouping of detections into
    identities (`/root/reference/condition.py:22-24`) is the same
    pairs→groups closure at single-node scale.
    """
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("u"),
            F.col(dst).cast("bigint").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    if e.isEmpty():
        return edges.sparkSession.createDataFrame(
            [], "node bigint, component bigint"
        )

    def large_star(cur: DataFrame) -> DataFrame:
        # For each node u: attach every neighbor v > u to m = min(N(u) ∪ {u}).
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m"))
        )
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(cur: DataFrame) -> DataFrame:
        # Orient edges large→small; attach each small neighbor (and u) to
        # the minimum of u's small neighborhood.
        o = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("m"))  # m <= every v <= u
        return (
            o.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select("u", F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    e = e.localCheckpoint(eager=True)
    n_prev = e.count()
    converged = False
    for _ in range(max_iter):
        nxt = small_star(large_star(e)).localCheckpoint(eager=True)
        n_nxt = nxt.count()
        # nxt ⊆ e and |nxt| = |e|  ⇒  nxt = e (exact, no hash check)
        if n_nxt == n_prev and nxt.exceptAll(e).isEmpty():
            e, converged = nxt, True
            break
        e, n_prev = nxt, n_nxt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(expected O(log n)); raise max_iter"
        )
    # Fixpoint: every edge is (member > root, root); roots map to themselves.
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        e.select(F.col("v").alias("node")).distinct()
        .select("node", F.col("node").alias("component"))
    )
    return members.union(roots)


def dedup_against_corpus(
    increment: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Incremental dedup: keep the increment rows that duplicate NOTHING
    in the reference corpus — exact (normalized-text hash anti-join) or
    near (MinHash band probe + exact-Jaccard verify ≥ ``threshold``).

    This is the growing-corpus shape: at 100 TB you never re-dedup the
    corpus against itself per ingest; you probe the new batch against the
    corpus's (band, band_sig) index. The corpus side here is exactly the
    persistable index — ``minhash_bands(corpus)`` plus the distinct text
    hashes — so a production pipeline computes it once per corpus version
    and bucket-joins each increment against it. Work per ingest:
    O(|increment| × BANDS) probe + candidate-proportional verification;
    the corpus is touched only through its index and the candidate rows'
    shingles. Intra-increment duplicates are deliberately NOT dropped
    here (that is ``exact_dedup``/``lsh_bucket_dedup``'s job).

    Reference analog: the tracker's dedup of new detections against
    already-tracked identities (`/root/reference/condition.py:22-24`).
    """
    inc_n = normalize_docs(increment).withColumn("h", F.xxhash64("norm_text"))
    corp_h = (
        normalize_docs(corpus)
        .select(F.xxhash64("norm_text").alias("h"))
        .distinct()
    )
    no_exact = inc_n.join(corp_h, "h", "left_anti").drop("h", "norm_text")

    inc_bands = minhash_bands(no_exact, n, hash_mode)
    corp_bands = minhash_bands(corpus, n, hash_mode).select(
        F.col("doc_id").alias("corp_id"), "band", "band_sig"
    )
    cand = (
        inc_bands.join(corp_bands, ["band", "band_sig"])
        .select("doc_id", "corp_id")
        .distinct()
    )
    # verify ONLY probed candidates: |inc ∩ corp| shingles → exact Jaccard
    inc_sh = word_shingles(increment, n)
    corp_sh = word_shingles(corpus, n).select(
        F.col("doc_id").alias("corp_id"), "shingle"
    )
    sizes_inc = inc_sh.groupBy("doc_id").agg(F.count("*").alias("sz_i"))
    sizes_corp = corp_sh.groupBy("corp_id").agg(F.count("*").alias("sz_c"))
    near_hit = (
        cand.join(inc_sh, "doc_id")
        .join(corp_sh, ["corp_id", "shingle"])
        .groupBy("doc_id", "corp_id")
        .agg(F.count("*").alias("inter"))
        .join(sizes_inc, "doc_id")
        .join(sizes_corp, "corp_id")
        .where(
            F.col("inter")
            / (F.col("sz_i") + F.col("sz_c") - F.col("inter"))
            >= threshold
        )
        .select("doc_id")
        .distinct()
    )
    return no_exact.join(near_hit, "doc_id", "left_anti")


def assign_components(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """(doc_id, component, is_canonical) for EVERY document: near-dup pairs
    → connected components → cluster label; docs in no pair are their own
    singleton component. ``is_canonical`` marks the one row per cluster a
    keep-set filter retains (the minimum doc_id — deterministic and
    replay-stable, same tie-break as ``exact_dedup``)."""
    cc = connected_components(pairs)
    return (
        documents.select("doc_id")
        .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
        .withColumn("is_canonical", F.col("component") == F.col("doc_id"))
    )


def block_dedup(documents: DataFrame, block_words: int = 8) -> DataFrame:
    """Exact SPAN dedup with document reassembly — the C4 / "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022) shape at
    block granularity: split every document into non-overlapping
    ``block_words``-word blocks, keep only the globally FIRST occurrence
    of each distinct block (ordered by (doc_id, block_pos)), and rebuild
    each document from its surviving blocks. Unlike ``exact_dedup`` (whole
    doc) this removes boilerplate spans *inside* otherwise-unique
    documents; block granularity stands in for the suffix-array exact
    substring pass, which has no bounded-memory distributed form.

    Every input row survives: a fully-duplicated document comes back with
    ``clean_text=''`` (downstream length filters drop it), with
    ``n_blocks`` / ``n_removed`` reporting the damage.

    Scale posture: block construction is a per-row JVM expression
    (``transform(sequence(...), slice(...))`` — no shuffle); keep-first is
    ONE ``min(struct(doc_id, bpos))`` HASH AGGREGATE keyed by block text
    — deliberately not a row_number window, because boilerplate blocks
    are exactly the hot keys C4 exists for and a per-key sort would put
    a billion-row key in one task; the agg's map-side combine collapses
    every hot key to one row per partition before the shuffle (at 100 TB
    swap the key for ``xxhash64(btext)`` exactly like ``exact_dedup``).
    Reassembly is one doc_id aggregate whose ordered concat happens
    INSIDE the row via ``array_sort(collect_list(struct(bpos, btext)))``
    — no per-group sort stage.
    """
    from data_harvesting_spark.functions.text import normalize_text

    w = F.filter(F.split(normalize_text("text"), " "), lambda x: x != "")
    d = documents.select("doc_id", w.alias("w")).withColumn(
        "nb", F.ceil(F.size("w") / F.lit(block_words)).cast("int")
    )
    blocks = d.where(F.col("nb") > 0).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, nb - 1), "
                f"i -> array_join(slice(w, i * {block_words} + 1, {block_words}), ' '))"
            )
        ).alias("bpos", "btext"),
    )
    kept = blocks.groupBy("btext").agg(
        F.min(F.struct("doc_id", "bpos")).alias("w")
    ).select(F.col("w.doc_id").alias("doc_id"), F.col("w.bpos").alias("bpos"), "btext")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bpos", "btext"))),
                lambda s: s["btext"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        d.select("doc_id", F.col("nb").alias("n_blocks"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_blocks",
            (F.col("n_blocks") - F.coalesce("n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )


def setsim_prefix_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """EXACT set-similarity self-join (Jaccard >= ``threshold`` over the
    distinct word-``n``-gram sets) via PREFIX FILTERING — the classic
    exact-result scale path (Chaudhuri et al. ICDE 2006; Bayardo et al.
    WWW 2007 "All-Pairs"; Vernica et al. SIGMOD 2010 for the MapReduce
    shape). Same output contract as ``ngram_jaccard_pairs`` (they share
    one oracle) but the self-join never touches full shingle sets:

    - order the element universe by ascending document frequency (rare
      elements first — ties broken by the element string, a total order);
    - a set with |s| elements only needs its first
      ``|s| - ceil(t*|s|) + 1`` elements (its *prefix*) in the join: if
      J(a,b) >= t then |a∩b| >= ceil(t*max(|a|,|b|)), and two sets whose
      overlap is >= alpha must collide inside prefixes of length
      |s| - alpha + 1 (pigeonhole on the shared total order);
    - candidates additionally pass the length filter
      t*|b| <= |a| <= |b|/t before verification;
    - only surviving candidate pairs are verified with an exact
      intersection count (candidate-proportional work).

    Because prefixes are by construction the RAREST elements of each set,
    the equi-join key distribution is anti-skewed: the hot stopword
    shingles that force ``ngram_jaccard_pairs`` to take a
    ``max_shingle_freq`` guard sort to the back and never enter the join.

    100 TB posture: df dimension is Heaps-bounded (vocabulary of distinct
    shingles grows sublinearly) and broadcast; per-doc rank/size ride ONE
    doc_id exchange; the candidate join shuffles only prefix rows keyed
    by rare shingles; verification joins are candidate-proportional.

    Reference parity: the same near-dup intent as
    `/root/reference/condition.py:63-77`, at corpus scale with exact
    (not approximate) output.
    """
    sh = word_shingles(documents, n)  # (doc_id, shingle), already distinct
    df_dim = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = sh.join(F.broadcast(df_dim), "shingle")
    by_doc = Window.partitionBy("doc_id")
    order = by_doc.orderBy("df", "shingle")
    # ceil epsilon: 0.5*sz can land an ULP above the exact integer in
    # IEEE; subtracting 1e-9 can only LENGTHEN the prefix (safe side).
    prefix_len = (
        F.col("sz")
        - F.ceil(F.lit(threshold) * F.col("sz") - F.lit(1e-9))
        + F.lit(1)
    )
    prefix = (
        ranked.select(
            "doc_id",
            "shingle",
            F.row_number().over(order).alias("rn"),
            F.count(F.lit(1)).over(by_doc).alias("sz"),
        )
        .where(F.col("rn") <= prefix_len)
        .drop("rn")
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("sz").alias("sz_a")
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("sz").alias("sz_b")
    )
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter, epsilon on the safe (keep) side
            & (F.col("sz_a") >= F.lit(threshold) * F.col("sz_b") - F.lit(1e-9))
            & (F.col("sz_b") >= F.lit(threshold) * F.col("sz_a") - F.lit(1e-9))
        )
        .select("doc_a", "doc_b", "sz_a", "sz_b")
        .distinct()
    )
    ta = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("w"))
    tb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("w"))
    verified = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "w"])
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return verified.where(jac >= threshold).select(
        "doc_a",
        "doc_b",
        "inter",
        F.col("sz_a").cast("bigint").alias("sz_a"),
        F.col("sz_b").cast("bigint").alias("sz_b"),
        F.round(jac, 6).alias("jaccard"),
    )
