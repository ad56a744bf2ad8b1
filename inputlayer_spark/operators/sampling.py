"""Deterministic sampling + document chunking for training-data curation.

Large-scale pipeline primitives the reference's data-prep story implies
but Spark must own at 100 TB:

* **hash_sample** — content-hash Bernoulli sampling. `rand()` is
  nondeterministic across runs/retries (a re-executed task would sample
  different rows, breaking exactly-once semantics on speculative
  execution); hashing a stable key makes the sample a pure function of
  the data. Partition-local (no shuffle), pushdown-friendly (the filter
  is a plain expression over one column).
* **cap_per_group** — deterministic per-group cap, the "max N documents
  per domain/source" rebalancing step. Keeps the k rows with the
  smallest seeded hash per group: a hash-ordered reservoir whose
  selection is stable under reruns and data reorderings. One shuffle on
  the group key (window), AQE-skew-safe.
* **chunk_documents** — token-window chunking with overlap (the
  pretraining tokenize-and-pack precursor). Pure JVM array expressions:
  tokenize → start offsets via `sequence` → `slice` per chunk →
  `posexplode`. No UDFs; output grows ~len/step rows per doc.

All three are oracle-checked against DuckDB computing the identical
hash/window/slice semantics (`md5`-derived hashes match bit-for-bit
across engines — functions.text.md5_long32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inputlayer_spark.functions import text as TX


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose seeded content
    hash lands in the first `fraction` of 10,000 buckets. Same key +
    seed → same decision, on any engine, any run."""
    bucket = (
        TX.seeded_md5_long32(F.col(key_col).cast("string"), seed) % 10_000
    )
    return df.filter(bucket < int(round(fraction * 10_000)))


def cap_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Keep at most `k` rows per group, chosen by smallest seeded hash
    (ties broken by key): a deterministic reservoir for per-source /
    per-domain rebalancing."""
    h = TX.seeded_md5_long32(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token windows.

    Output: (doc_id, chunk_id, chunk, n_tokens), one row per window;
    windows start every `chunk_tokens - overlap` tokens and the last
    window may be short. Zero-token documents produce zero chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        TX.tokens(F.col(text_col)).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    starts = F.sequence(
        F.lit(0), F.size("__toks") - 1, F.lit(step)
    )
    exploded = toked.select(
        "doc_id",
        "__toks",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(piece, " ").alias("chunk"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col: str, seed: int = 0
) -> DataFrame:
    """Per-row Bernoulli sampling with a ROW-SPECIFIC keep probability
    (the quality-weighted subsampling step of modern curation recipes:
    keep each document with probability = its quality weight). The
    coin is the seeded content hash mapped to a uniform in [0, 1), so
    the decision is a pure function of (key, seed) — stable under task
    retries and reruns — and the kept set is exactly
    `hash_uniform(key) < clamp(weight, 0, 1)`. Partition-local, no
    shuffle, plain expression → full pushdown.
    """
    u = (
        TX.seeded_md5_long32(F.col(key_col).cast("string"), seed).cast("double")
        / float(2**32)
    )
    wc = F.col(weight_col).cast("double")
    # NULL / NaN weights mean "no keep probability" → drop (Spark's
    # least/greatest SKIP nulls and order NaN above every number, so a
    # bare clamp would silently keep such rows at probability 1)
    w = F.when(
        wc.isNull() | F.isnan(wc), F.lit(0.0)
    ).otherwise(F.greatest(F.lit(0.0), F.least(F.lit(1.0), wc)))
    return df.filter(u < w)
