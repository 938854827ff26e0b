"""Byte-pair-encoding tokenizer — real merges, trained distributed,
applied vectorized.

Replaces the regex token-count *approximation* (``functions/text.py:
token_count``) with an actual BPE: learned merge table, greedy
lowest-rank encoding (the GPT-2 algorithm). The reference pipeline has no
tokenizer (it counts detections, `condition.py:101-118`); an LLM-data
pipeline exporting token-budgeted training shards needs exact token
counts, so this is graft surface, built from the public BPE algorithm
(Sennrich et al. 2016; the GPT-2 `bpe()` reference implementation).

Scale design — three separately-honest stages:

1. **Training corpus pass** (`word_frequencies`): ONE distributed
   hash-aggregation ``explode(words) → groupBy(word).count()``. This is
   the only stage that touches the corpus; its output is the word-
   frequency table, which by Heaps' law is millions of rows for 100 TB of
   text — bounded, and truncatable to the top-K words by mass.
2. **Merge learning** (`train_bpe_merges`): the classic sequential loop
   over the *word-frequency table* (every public tokenizer trains this
   way — each merge depends on the previous, so the loop is inherently
   driver-side; the input is the bounded table from stage 1, never the
   corpus).
3. **Apply** — two paths with identical semantics:
   - `bpe_token_count_udf` / `bpe_encode_udf`: Arrow-batched pandas UDF
     running the greedy lowest-rank encoder with a per-batch word cache
     (Zipf makes the cache hit rate ~99%); works for any merge-table
     size. The scale path.
   - `bpe_token_count_expr`: a pure-Column nested-`replace` chain for
     SMALL merge tables — whole-stage codegen, zero Python, and exactly
     expressible in ANSI SQL, which is what lets the catalog value-check
     the tokenizer against DuckDB (`bpe_token_count_oracle_expr` emits
     the same algebra as SQL text).

Why the nested-replace chain is EXACT (not an approximation of) BPE:

* Represent the symbol sequence as ``|s1||s2||...|`` — every symbol
  wrapped in its own separator pair, so adjacent symbols share no
  characters and a single left-to-right non-overlapping ``replace`` of
  ``|a||b|`` → ``|ab|`` merges every occurrence of the pair in one pass
  (with a SHARED separator, ``replace(' a a a ', ' a a ')`` misses the
  second occurrence — the wrapped form does not).
* One such pass is a fixpoint for that pair: after it, no two adjacent
  symbols form the pair (the scan consumed every adjacency).
* Applying merges in RANK ORDER equals the greedy lowest-rank-first
  algorithm, because a merge can never create an occurrence of an
  earlier-rank pair: merging (a,b)→ab only creates adjacencies that
  involve the NEW symbol ab, and rank-j pairs (j < i) are defined over
  symbols that existed before ab did.

A hypothesis property test (`tests/test_bpe.py`) pins the equivalence of
the three implementations on arbitrary inputs.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Separator for the wrapped-symbol string form. The catalog demo
# normalizes text to [a-z ] first, so any printable non-alphanumeric works
# and keeps the generated oracle SQL readable.
SEP = "|"

# Demo merge table for the oracle-checked catalog queries: the first 16
# merges `train_bpe_merges` learns from the sf0.001 documents corpus
# (deterministic — tie-breaks are (count desc, pair lexicographic);
# tests/test_bpe.py::test_demo_merges_are_the_sf0001_training_output
# re-derives it from the parquet). Hard-coded so the apply queries are
# constant-folded plans independent of which sf dir they run on.
DEMO_MERGES: tuple[tuple[str, str], ...] = ()  # filled below


# --------------------------------------------------------------- training
def word_frequencies(df: DataFrame, col: str = "text") -> DataFrame:
    """The ONE corpus pass: normalized word → occurrence count.

    Normalization matches the catalog's apply path: lowercase, strip
    non-[a-z ], collapse whitespace. Map-side partial aggregation makes
    the shuffle O(distinct words per partition), not O(corpus).
    """
    norm = F.regexp_replace(
        F.lower(F.col(col)), r"[^a-z ]", ""
    )
    norm = F.trim(F.regexp_replace(norm, r" +", " "))
    w = F.explode(F.split(norm, " ")).alias("word")
    return (
        df.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe_merges(
    df: DataFrame,
    col: str = "text",
    num_merges: int = 16,
    max_vocab_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus.

    Distributed word-count (stage 1) → bounded collect of the top
    ``max_vocab_words`` words by (freq desc, word) — the standard
    public-tokenizer shape — → sequential merge learning on the driver
    (stage 2). Deterministic: every tie in pair counts breaks to the
    lexicographically smallest pair.
    """
    rows = (
        word_frequencies(df, col)
        .orderBy(F.desc("freq"), "word")
        .limit(max_vocab_words)
        .collect()
    )
    word_freqs = {r["word"]: r["freq"] for r in rows}
    return train_bpe_merges_from_freqs(
        word_freqs, num_merges=num_merges, min_pair_count=min_pair_count
    )


def train_bpe_merges_from_freqs(
    word_freqs: dict[str, int],
    num_merges: int = 16,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """The classic sequential BPE training loop over a word-frequency
    table (Sennrich et al. 2016, Algorithm 1). Pure Python on a bounded
    input — see module docstring for why this stage is driver-side in
    every real tokenizer."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


# ---------------------------------------------------------------- encoder
def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Greedy lowest-rank-first BPE encoding of one word — the GPT-2
    `bpe()` algorithm: repeatedly merge ALL occurrences of the lowest-rank
    pair present, left to right, until no known pair remains."""
    sym: list[str] = list(word)
    while len(sym) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


def normalize_for_bpe(text: str) -> str:
    """Python twin of the catalog normalization (lowercase, [a-z ] only,
    collapsed whitespace) — keeps the three apply paths comparable."""
    import re

    return re.sub(r" +", " ", re.sub(r"[^a-z ]", "", text.lower())).strip()


def encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Encode a whole document: normalize, split on spaces, encode each
    word independently (merges never cross word boundaries — the standard
    pre-tokenization contract)."""
    if cache is None:
        cache = {}
    toks: list[str] = []
    for w in normalize_for_bpe(text).split(" "):
        if not w:
            continue
        enc = cache.get(w)
        if enc is None:
            enc = encode_word(w, ranks)
            cache[w] = enc
        toks.extend(enc)
    return toks


def _ranks(merges) -> dict[tuple[str, str], int]:
    return {tuple(m): i for i, m in enumerate(merges)}


def bpe_token_count_udf(merges):
    """Arrow-batched pandas UDF: exact BPE token count per document.

    The scale apply path — works for any merge-table size; the per-batch
    word→encoding cache turns Zipf-distributed text into ~O(distinct
    words) encoder work per batch."""
    from pyspark.sql.functions import pandas_udf

    ranks = _ranks(merges)

    @pandas_udf("int")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return texts.map(
            lambda t: 0 if t is None else len(encode_text(t, ranks, cache))
        ).astype("int32")

    return _count


def bpe_encode_udf(merges):
    """Arrow-batched pandas UDF: the token array itself (array<string>) —
    for pipelines exporting pre-tokenized shards."""
    from pyspark.sql.functions import pandas_udf

    ranks = _ranks(merges)

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, tuple[str, ...]] = {}
        return texts.map(
            lambda t: [] if t is None else encode_text(t, ranks, cache)
        )

    return _enc


# ------------------------------------------------- codegen / oracle path
def _norm_expr(col: Column) -> Column:
    n = F.regexp_replace(F.lower(col), r"[^a-z ]", "")
    return F.trim(F.regexp_replace(n, r" +", " "))


def bpe_token_count_expr(col: Column | str, merges=None) -> Column:
    """Exact BPE token count as a pure Column expression (whole-stage
    codegen, zero Python) for a small constant merge table.

    Wrap every character in SEP pairs, apply each merge in rank order as
    one global replace of ``|a||b|`` → ``|ab|`` (exactness argument in the
    module docstring), count symbols by length arithmetic, subtract the
    space symbols (spaces never merge — no merge contains a space)."""
    if merges is None:
        merges = DEMO_MERGES
    c = F.col(col) if isinstance(col, str) else col
    norm = _norm_expr(c)
    s = F.regexp_replace(norm, "(.)", f"{SEP}$1{SEP}")
    for a, b in merges:
        s = F.replace(s, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a}{b}{SEP}"))
    n_syms = (F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))) / 2
    n_spaces = F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit("")))
    n_spaces = F.when(F.length(norm) > 0, n_spaces).otherwise(F.lit(0))
    return (n_syms - n_spaces).cast("int")


def bpe_token_count_oracle_expr(col_sql: str, merges=None) -> str:
    """The SAME algebra as `bpe_token_count_expr`, emitted as ANSI SQL for
    the DuckDB oracle — generated from one constant so the two engines can
    never drift."""
    if merges is None:
        merges = DEMO_MERGES
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({col_sql}), "
        f"'[^a-z ]', '', 'g'), ' +', ' ', 'g'))"
    )
    s = f"regexp_replace({norm}, '(.)', '{SEP}\\1{SEP}', 'g')"
    for a, b in merges:
        s = f"replace({s}, '{SEP}{a}{SEP}{SEP}{b}{SEP}', '{SEP}{a}{b}{SEP}')"
    n_syms = f"(length({s}) - length(replace({s}, '{SEP}', ''))) / 2"
    n_spaces = f"(length({norm}) - length(replace({norm}, ' ', '')))"
    return (
        f"CAST({n_syms} - (CASE WHEN length({norm}) > 0 THEN {n_spaces} "
        f"ELSE 0 END) AS INT)"
    )


def token_count_via_replace_chain(text: str, merges) -> int:
    """Pure-Python simulation of the nested-replace path (str.replace has
    the same L2R non-overlapping semantics as SQL replace) — the property
    test compares this against `encode_text` to pin the exactness
    argument without a Spark session in the loop."""
    norm = normalize_for_bpe(text)
    s = "".join(f"{SEP}{ch}{SEP}" for ch in norm)
    for a, b in merges:
        s = s.replace(f"{SEP}{a}{SEP}{SEP}{b}{SEP}", f"{SEP}{a}{b}{SEP}")
    n_syms = (len(s) - len(s.replace(SEP, ""))) // 2
    n_spaces = norm.count(" ")
    return n_syms - n_spaces


# The sf0.001-trained table (see DEMO_MERGES comment above).
DEMO_MERGES = (
    ("e", "r"),
    ("o", "r"),
    ("i", "n"),
    ("o", "w"),
    ("s", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("m", "er"),
    ("a", "t"),
    ("a", "n"),
    ("c", "an"),
    ("s", "can"),
    ("c", "o"),
    ("co", "lu"),
    ("colu", "m"),
)
