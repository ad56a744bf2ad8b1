"""Distributed BPE merge training (Sennrich et al. 2016, arXiv:1508.07909)
— the tokenizer-training step a pretraining pipeline runs after
`functions.text.vocabulary`.

Spark-first shape: ONE corpus pass builds the word-count table (the
vocabulary — bounded by distinct words, never corpus-sized); every merge
round then works on that table only: a pair-count hash aggregate
(map-side combinable), a 1-row driver collect of the argmax pair (the
merge table is driver-sized BY DEFINITION — n_merges rows), and a
literal string replace applying the merge. The vocab is
localCheckpointed per round so lineage/analysis stays flat across
rounds.

Cross-engine merge trick (what makes the DuckDB oracle possible): a
word's symbol sequence is encoded as a DOUBLE-SENTINEL string
``\\x01\\x01 s1 \\x01\\x01 s2 \\x01\\x01`` (sentinel = chr(1), never in the
token alphabet). Merging pair (a, b) is then the LITERAL replace of
``\\x01 a \\x01\\x01 b \\x01`` with ``\\x01 ab \\x01``: the single outer
sentinels leave one sentinel of each neighbour separator unconsumed, so
left-to-right non-overlapping replace — the exact semantics of both
Java's String replace and DuckDB's replace() — merges every
non-overlapping occurrence in one pass, chained occurrences included
('a a a' with pair (a,a) -> [aa, a]), while partial-symbol matches are
impossible (the pattern demands a sentinel on both flanks of each
symbol). No per-row fold, no UDF: the merge is whole-stage-codegen
string work.

Tie-break: (pair count DESC, left ASC, right ASC) — deterministic where
the original learn_bpe takes dict order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inputlayer_spark.functions import text as TX

SENT = "\x01"
SENT2 = SENT * 2


def _sym_string(word_col):
    """word -> '\\x01\\x01c1\\x01\\x01c2\\x01\\x01...' (initial symbols =
    characters)."""
    return F.concat(F.lit(SENT2), F.regexp_replace(word_col, "(.)", "$1" + SENT2))


def _symbols(s_col):
    """Symbol-string -> symbol array (split on sentinel runs)."""
    return F.filter(F.split(s_col, SENT + "+"), lambda x: x != "")


def merge_pattern(a: str, b: str) -> tuple[str, str]:
    """(search, replace) literals applying merge (a, b) to a symbol
    string."""
    return (SENT + a + SENT2 + b + SENT, SENT + a + b + SENT)


def bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus. Returns the merge
    table (merge_rank, lhs, rhs, merged, pair_count) — driver-sized by
    definition. Stops early when the best pair's corpus count falls
    below `min_pair_count`."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    spark = df.sparkSession
    words = (
        df.select(F.explode(TX.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = words.select(
        F.col("cnt"), _sym_string(F.col("w")).alias("s")
    ).localCheckpoint(eager=True)

    merges: list[tuple] = []
    for rank in range(n_merges):
        with_syms = vocab.select("cnt", _symbols(F.col("s")).alias("y"))
        pair_arr = F.when(
            F.size("y") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("y") - 1),
                lambda i: F.struct(
                    F.element_at("y", i).alias("a"),
                    F.element_at("y", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            with_syms.select("cnt", F.explode(pair_arr).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .first()
        )
        if top is None or top["n"] < min_pair_count:
            break
        a, b = top["a"], top["b"]
        merges.append((rank, a, b, a + b, int(top["n"])))
        pat, rep = merge_pattern(a, b)
        vocab = vocab.select(
            "cnt", F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s")
        )
        # pin only every 8th round (r13): the per-round eager
        # localCheckpoint was one extra job per merge on a vocab-sized
        # (distinct-words, never corpus-sized) frame — half of each
        # round's job count for data that a lazy replace chain over the
        # pinned base recomputes in microseconds. The periodic pin
        # keeps the chain depth bounded for real tokenizer-sized merge
        # counts (32k merges would otherwise build a 32k-deep plan and
        # pay O(n²) replace work).
        if (rank + 1) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)

    schema = (
        "merge_rank int, lhs string, rhs string, merged string, pair_count long"
    )
    return spark.createDataFrame(merges, schema)


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
) -> DataFrame:
    """Apply a learned merge table to the corpus: every token becomes
    its BPE symbol array (merges applied in rank order — the same
    literal-replace chain training used, so encode(train corpus) is
    consistent with the learned statistics by construction).

    `merges` is the `bpe_merges` output DataFrame or an iterable of
    (lhs, rhs) pairs in rank order. The replace chain is built ONCE
    into the plan (merge tables are driver-sized); each token pays
    |merges| literal scans — linear, no UDF.

    Output: (id_col, token, pieces array<string>) — one row per token
    occurrence position is NOT preserved (bag semantics, like the
    training pass).
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        pairs = [(r["lhs"], r["rhs"]) for r in rows]
    else:
        pairs = list(merges)
    toks = df.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("token")
    )
    s = _sym_string(F.col("token"))
    for a, b in pairs:
        pat, rep = merge_pattern(a, b)
        s = F.replace(s, F.lit(pat), F.lit(rep))
    return toks.select(
        F.col(id_col), F.col("token"), _symbols(s).alias("pieces")
    )
