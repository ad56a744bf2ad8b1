"""Text-analysis Column expressions for large-scale training-data pipelines.

These go beyond the reference surface (BASELINE.json asks for LLM-data-
pipeline operators): tokenization, shingling, language-ID heuristics,
quality scoring, and cross-engine-deterministic hashing. Everything is a
built-in-function expression — no Python in the hot path — so a 100 TB
documents scan stays in whole-stage codegen. The deliberate exceptions
are Arrow-batched pandas kernels, never row-at-a-time UDFs:
`compression_ratio` (zlib has no SQL expression), `normalize_text`'s NFC
pass, the MinHash signature kernel (operators/dedup.py), and
semantic_dedup's per-cluster Gram kernel — the same set
test_no_python_eval_in_jvm_operator_paths pins.

Cross-engine hashing trick: `md5` produces identical hex in Spark and
DuckDB, so `md5_long32` (first 8 hex chars as a long) is a deterministic
64→32-bit hash both engines agree on. MinHash/SimHash/fingerprints built
on it are therefore oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Top English stopwords used by the language-ID / quality heuristics.
# Kept tiny on purpose: the heuristic must be replicable in ANSI SQL.
EN_STOPWORDS = ("the", "and", "is", "in", "to", "of", "a", "that", "it", "for")


def md5_long32(s: Column) -> Column:
    """First 32 bits of md5(s) as a non-negative long — identical in
    Spark (`conv(substr(md5(x),1,8),16,10)`) and DuckDB
    (`('0x' || substr(md5(x),1,8))::BIGINT`)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def seeded_md5_long32(s: Column, seed: int) -> Column:
    """Seeded variant: hash of '<seed>:<s>'. Basis for MinHash families."""
    return md5_long32(F.concat(F.lit(f"{seed}:"), s))


def tokens(text: Column) -> Column:
    """Whitespace/punct tokenization to lowercase word array.

    array_remove(arr, '') ≡ filter(arr, t -> t != '') here — split
    never yields NULL elements, the only case where the two differ —
    and skips the lambda-HOF construction path (r13: each F.filter
    lambda costs ~10-30 py4j round-trips at build time; tokens() is on
    nearly every text query's construction path)."""
    arr = F.split(F.lower(F.trim(text)), r"[^a-z0-9']+")
    return F.array_remove(arr, "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-gram (shingle) array over the lowercased text."""
    t = F.lower(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substring(t, i, n))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-materialized token array.

    IMPORTANT for hot paths: pass a *column reference* to a token array,
    not the `tokens(text)` expression tree. Catalyst inlines the lambda's
    free expressions per array element, so shingling directly off
    `tokens(text)` re-tokenizes the document once per shingle — O(len²)
    (measured 12× slower at sf0.1). Materialize tokens with one
    `.select(tokens(text).alias(...))` first.
    """
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles joined by single spaces.

    Convenience single-expression form; for per-shingle downstream work
    (explode/hash pipelines) prefer `shingles_from_tokens` on a
    materialized token column — see its docstring.
    """
    return shingles_from_tokens(tokens(text), n)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    sw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        sw.cast("double") / F.size(toks).cast("double")
    )


def punct_ratio(text: Column) -> Column:
    total = F.length(text)
    nonpunct = F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        (total - nonpunct).cast("double") / total.cast("double")
    )


def mean_word_length(text: Column) -> Column:
    toks = tokens(text)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / F.size(toks).cast("double")
    )


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic: reasonable length, low punct
    noise, natural stopword density, plausible word lengths. Deterministic
    and SQL-replicable (each component is).

    Accepts a Column, or a COLUMN NAME for the fast construction path
    (r13): the Column form builds ~6 lambda higher-order expressions
    (~0.4 s of py4j round-trips per call site — source_filter paid it
    on every query build); the name form is ONE F.expr with the
    identical expression semantics (all float literals D-suffixed so
    they parse as double, matching F.lit(float))."""
    if isinstance(text, str):
        t = f"`{text}`"
        toks = f"array_remove(split(lower(trim({t})), '[^a-z0-9\\']+'), '')"
        sw_list = ",".join(f"'{w}'" for w in EN_STOPWORDS)
        sw_ratio = (
            f"CASE WHEN size({toks}) = 0 THEN 0.0D ELSE"
            f" cast(size(filter({toks}, w -> w IN ({sw_list}))) as double)"
            f" / cast(size({toks}) as double) END"
        )
        mwl = (
            f"CASE WHEN size({toks}) = 0 THEN 0.0D ELSE"
            f" cast(aggregate({toks}, cast(0 as bigint),"
            f" (acc, w) -> acc + length(w)) as double)"
            f" / cast(size({toks}) as double) END"
        )
        punct = (
            f"CASE WHEN length({t}) = 0 THEN 0.0D ELSE"
            f" cast(length({t}) - length(regexp_replace({t},"
            f" '[^\\\\w\\\\s]', '')) as double)"
            f" / cast(length({t}) as double) END"
        )
        return F.expr(
            f"(least(cast(cast(size({toks}) as bigint) as double) / 50.0D, 1.0D)"
            f" + (1.0D - least(({punct}) * 4.0D, 1.0D))"
            f" + (CASE WHEN ({sw_ratio}) >= 0.1D AND ({sw_ratio}) <= 0.6D"
            f" THEN 1.0D ELSE 0.5D END)"
            f" + (CASE WHEN ({mwl}) >= 3.0D AND ({mwl}) <= 10.0D"
            f" THEN 1.0D ELSE 0.5D END)) / 4.0D"
        )
    n_tok = token_count(text)
    len_score = F.least(n_tok.cast("double") / 50.0, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.when((sw >= 0.1) & (sw <= 0.6), 1.0).otherwise(0.5)
    mwl = mean_word_length(text)
    mwl_score = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.5)
    return (len_score + punct_score + sw_score + mwl_score) / 4.0


def lang_id(text: Column) -> Column:
    """Tiny heuristic language ID: 'en' when English stopword density is
    high enough, else 'und'. Meant as the Spark-side plumbing for a real
    model; replicable in the SQL oracle."""
    return F.when(stopword_ratio(text) >= 0.08, F.lit("en")).otherwise(F.lit("und"))


def doc_fingerprint(text: Column) -> Column:
    """Order-insensitive 32-bit document fingerprint: xor-free, SQL-safe
    formulation = min over word-shingle hashes (a 1-perm MinHash)."""
    return F.array_min(F.transform(word_shingles(text, 3), md5_long32)).cast("long")


def minhash_signature(text: Column, num_perm: int = 16, shingle_n: int = 3) -> Column:
    """MinHash signature: per seed i, min over shingles of seeded hash."""
    sh = word_shingles(text, shingle_n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: seeded_md5_long32(s, i))).cast("long")
            for i in range(num_perm)
        ]
    )


def simhash_from_hashes(hashes: Column) -> Column:
    """SimHash from an already-materialized array of 32-bit shingle hashes:
    bit b of the result = majority vote of bit b across the hashes.

    Pass a *column reference* to the hash array (materialize
    `transform(shingles, md5_long32)` first) — inlining the md5 expression
    here would recompute it once per bit (32×).
    """
    cnt = F.size(hashes)
    acc = F.lit(0).cast("long")

    def bit_test(mask: int):
        # must stay a single-arg lambda: pyspark treats a 2-arg callable
        # (even with a default) as the (element, index) HOF form
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    for b in range(32):
        mask = 1 << b
        votes = F.size(F.filter(hashes, bit_test(mask)))
        acc = acc + F.when(votes * 2 >= cnt, F.lit(mask).cast("long")).otherwise(0)
    return acc


def simhash64(text: Column, n: int = 3) -> Column:
    """64-bit SimHash over word shingles using md5-derived bit votes.

    Convenience single-expression form (recomputes md5 per bit vote);
    hot paths should materialize the hash array and use
    `simhash_from_hashes`.
    """
    return simhash_from_hashes(F.transform(word_shingles(text, n), md5_long32))


# ---------------------------------------------------------------- PII scrub

# Patterns chosen to be valid in BOTH Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backreferences — so the oracle can run the
# identical expressions. Order matters: emails are scrubbed before
# phone-shaped digit runs so the local part's digits don't half-match.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(text: Column) -> Column:
    """Redact common PII shapes (emails, SSNs, phone numbers, IPv4s)
    with typed placeholders — the masking step of a training-data
    pipeline. Pure JVM `regexp_replace` chain: whole-stage codegen, no
    Python. At 100 TB this is a narrow map over the text column."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_count(text: Column) -> Column:
    """How many PII matches the scrubber would redact (sum over
    pattern types) — the audit metric next to the scrub."""
    total = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
    return total


# ----------------------------------------------------------- repetition

def dup_line_fraction(text: Column) -> Column:
    """Fraction of lines that are duplicates of an earlier line —
    the Gopher repetition filter's first signal (Rae et al. 2021,
    §A.1.1: documents with a high duplicate-line fraction are
    boilerplate/spam). Pure array expressions: split → count distinct
    non-empty lines vs total."""
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(lines))).cast("double") / n
    )


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of the document's word-bigram occurrences taken by the
    single most frequent bigram (Gopher's top-n-gram signal: chants and
    keyword stuffing repeat one n-gram).

    Single-pass formulation: sort the bigram array, then one
    `F.aggregate` run-length scan (state = last gram, current run,
    best run). A per-distinct-gram `filter` count would inline the
    gram expression per element — the O(len²) re-evaluation trap
    (see shingles_from_tokens)."""
    grams = F.array_sort(shingles_from_tokens(tokens(text), 2))
    n = F.size(grams)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    scan = F.aggregate(
        grams,
        init,
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n <= 1, F.lit(0.0)).otherwise(scan.cast("double") / n)


def compression_ratio(text: Column) -> Column:
    """zlib compressed/raw byte ratio — the classic cheap repetition /
    low-entropy detector production pipelines filter on (boilerplate
    and template spam compress far below ~0.4; natural prose sits
    ~0.5-0.9). zlib is not expressible in SQL, so this is the one text
    signal that runs as a Python kernel — an Arrow-batched pandas_udf
    (one zlib.compress per document per batch, no per-row Python
    round-trips), NOT a row-at-a-time UDF. Empty/null text → 1.0
    (nothing to compress ⇒ nothing repetitive)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(col: pd.Series) -> pd.Series:
        import zlib

        def one(s):
            if s is None or len(s) == 0:
                return 1.0
            raw = s.encode("utf-8", "ignore")
            return len(zlib.compress(raw, 6)) / len(raw)

        return col.map(one)

    return _ratio(text)


def vocabulary(df, text_col: str, top_n: int = 1000, min_count: int = 1):
    """Corpus vocabulary for tokenizer training: the `top_n` most
    frequent tokens (the engine's standard lowercase word tokenizer,
    `tokens()`) with counts, ties broken lexicographically so the
    cutoff is deterministic. One explode + one hash-aggregate on the
    token — the same shape word-count holds at any corpus size; the
    result is vocabulary-sized, not corpus-sized."""
    from pyspark.sql import functions as F

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_n)
    )


def tfidf(df, id_col: str, text_col: str, min_tf: int = 2, hot_keys=None,
          salt: int = 16):
    """Per-document TF-IDF term scores: tf = in-document token count
    (standard `tokens()` tokenizer), idf = ln(N / df) over distinct
    containing documents, score = tf * idf. `min_tf` is an INTEGER
    admission cut, so the returned row set is engine-exact while the
    float score column is tolerance-comparable. Two aggregates (one
    per (doc, token), one per token) joined back on the token key.

    The distinct-token table of an open-tokenizer web corpus is
    heavy-tailed (typos, numbers, URLs — 1e8+ rows at 100 TB), so the
    dfreq side is NEVER hint-broadcast: both sides already pay the
    token-key shuffle, and the join stays a shuffle join unless
    Catalyst/AQE *measures* the side under the broadcast threshold.
    Plan pinned in tests/test_plans.py (no ResolvedHint on dfreq).

    `hot_keys` (VERDICT r11 #3): known EXTREME-mass tokens (a stopword
    list — the operator can't know your corpus's hot keys, you do).
    The tf⋈dfreq join is salted on those keys only
    (operators/skew.salted_join): a hot token's per-doc tf rows spread
    over `salt` shuffle sub-keys instead of one straggler partition.
    SKEW_r12.json records why this is operator-level and explicit: at
    locally-achievable volumes a 25%-mass key stays under AQE's
    skew-split thresholds (shuffle compression absorbs most of the byte
    skew), so the salt is the tool that works at every scale."""
    from pyspark.sql import functions as F

    # corpus doc count as a 1-row broadcast cross join instead of a
    # driver-side .count() action (r13, guide §2.4): same exact value,
    # one less serialized job before the main query (see lm_score's
    # __vsize for the same rewrite).
    nd_df = df.agg(F.count(F.lit(1)).cast("double").alias("__ndocs"))
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = (
        tok.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    dfreq = tok.distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    if hot_keys:
        from inputlayer_spark.operators.skew import salted_join

        hot_df = df.sparkSession.createDataFrame(
            [(t,) for t in hot_keys], "token string"
        )
        joined = salted_join(tf, dfreq, "token", salt=salt, hot_keys=hot_df)
    else:
        joined = tf.join(dfreq, "token")
    # no broadcast() hint (plan pin: tfidf carries NO hint anywhere) —
    # the 1-row global aggregate broadcasts on its size estimate alone
    joined = joined.join(nd_df)
    return joined.select(
        F.col(id_col),
        F.col("token"),
        F.col("tf"),
        (
            F.col("tf").cast("double")
            * F.log(F.col("__ndocs") / F.col("df").cast("double"))
        ).alias("score"),
    )


def lm_score(df, id_col: str, text_col: str, alpha: float = 0.5,
             hot_keys=None, salt: int = 16):
    """Corpus-trained bigram language-model score per document — the
    classic curation gate for gibberish / boilerplate outliers (docs
    whose token transitions are improbable under the corpus's own
    bigram statistics): train C(w1,w2) and C(w1) on the WHOLE input,
    then score each document as the mean log of the add-alpha-smoothed
    transition probability

        avg_logprob = mean over the doc's bigrams of
                      ln( (C(w1,w2) + alpha) / (C(w1) + alpha * V) )

    with V = corpus distinct-token count. Documents with fewer than two
    tokens have no bigrams and are absent from the output.

    Scale shape (same class as `tfidf`): one explode pass over the
    token volume, two token-key aggregations, and two token-key shuffle
    joins back to the per-document bigram occurrences. Like tfidf's
    dfreq, the bigram-count table of an open-tokenizer web corpus is
    heavy-tailed and is NEVER hint-broadcast — Catalyst/AQE may still
    stat-broadcast a measured-small side. C(w1) is derived from the
    bigram counts (sum over w2), so prefix counts and pair counts are
    consistent by construction.

    `hot_keys` (VERDICT r11 #3): known extreme-mass tokens. Only the
    C(w1) join is salted — its shuffle keys on w1 ALONE, so a 25%-mass
    stopword lands one partition; the (w1, w2) pair join's keys
    self-spread over the hot token's successors and stay unsalted.
    See tfidf's docstring + SKEW_r12.json for why this is an explicit
    operator option rather than trust in AQE skew-split."""
    from pyspark.sql import functions as F

    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    )
    # corpus vocabulary size — as a 1-row broadcast cross join instead
    # of a driver-side .count() action (r13, guide §2.4): the old
    # scalar collect serialized a full tokenize+distinct pass BEFORE
    # the main query could even be submitted; as a subtree of the one
    # plan it runs in the same job (its stages overlap the bigram
    # stages) and no separate action/job is paid. Same exact
    # count-distinct value, same double arithmetic downstream.
    vs_df = (
        toks.select(F.explode("__toks").alias("t"))
        .agg(F.count_distinct("t").cast("double").alias("__vsize"))
    )
    # ordered bigram pairs; sequence(1, n-1) guarded so one-token docs
    # don't generate a DESCENDING sequence
    pairs = toks.filter(F.size("__toks") >= 2).select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 1),
                lambda i: F.struct(
                    F.element_at("__toks", i).alias("w1"),
                    F.element_at("__toks", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    uni = big.groupBy("w1").agg(F.sum("cb").alias("cu"))
    paired = pairs.join(big, ["w1", "w2"])
    if hot_keys:
        from inputlayer_spark.operators.skew import salted_join

        hot_df = df.sparkSession.createDataFrame(
            [(t,) for t in hot_keys], "w1 string"
        )
        scored = salted_join(paired, uni, "w1", salt=salt, hot_keys=hot_df)
    else:
        scored = paired.join(uni, ["w1"])
    # no broadcast() hint (plan pin: lm_score carries NO hint anywhere)
    # — a global aggregate is estimated at 1 row, so JoinSelection
    # plans the no-condition join as a BroadcastNestedLoopJoin on its
    # own (plan-pinned below the hint check)
    scored = scored.join(vs_df)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.avg(
                F.log(
                    (F.col("cb").cast("double") + F.lit(float(alpha)))
                    / (
                        F.col("cu").cast("double")
                        + F.lit(float(alpha)) * F.col("__vsize")
                    )
                )
            ),
            6,
        ).alias("avg_logprob"),
    )


def top_keywords(df, id_col: str, text_col: str, k: int = 5):
    """Top-k TF-IDF keywords per document, ties broken by token text —
    deterministic within an engine (cross-engine rank boundaries on
    float scores are why the oracle row uses `tfidf` instead)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = tfidf(df, id_col, text_col, min_tf=1)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def bm25_search(
    df,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-k retrieval over the document corpus (Robertson &
    Zaragoza 2009, the Lucene `k1/b` variant with the +1-shifted IDF so
    scores stay positive) — the retrieval primitive a curation pipeline
    uses for targeted decontamination ("find the documents closest to
    this eval prompt") and for building contrastive quality sets.

    Scale shape: the query's term set is a LITERAL IN-filter applied at
    the token explode, so the corpus pass keeps only |q|-term postings
    (predicate pushdown straight into the scan projection — everything
    else never leaves the map side); document length and N/avgdl are
    one narrow aggregate each; the per-term document frequencies are at
    most |q| rows (broadcast by construction); the final top-k is a
    TakeOrdered, never a global sort. Scores are rounded to 6 dp BEFORE
    ranking so the (score desc, id asc) order — and therefore the k-th
    boundary — is reproducible across engines.

    Output: (id_col, score) — the k highest-scoring documents.
    """
    import re

    terms = sorted({t for t in re.split(r"[^a-z0-9']+", query.lower()) if t})
    if not terms or k < 1:
        return df.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)
    toked = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    stats = toked.agg(
        F.count(F.lit(1)).cast("double").alias("__N"),
        F.avg(F.size("__toks")).alias("__avgdl"),
    )
    # ONE corpus pass for the postings: the doc length rides the
    # explode of the ALREADY-FILTERED token array (query terms only),
    # so non-matching docs contribute zero rows and no second scan /
    # length join is needed
    postings = (
        toked.select(
            F.col(id_col),
            F.size("__toks").cast("double").alias("__dl"),
            F.explode(F.filter("__toks", lambda t: t.isin(terms))).alias("__t"),
        )
        .groupBy(id_col, "__t")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    dfreq = postings.groupBy("__t").agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("__df")
    )
    scored = (
        postings.join(F.broadcast(dfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__N") - F.col("__df") + 0.5)
                    / (F.col("__df") + 0.5)
                )
                * (F.col("__tf") * (k1 + 1.0))
                / (
                    F.col("__tf")
                    + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def gopher_quality_flags(
    df,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    carry: tuple = (),
):
    """Gopher/MassiveText composite quality gate (Rae et al. 2021,
    arXiv:2112.11446 §A.1.1) — the rule battery production pipelines
    run before any model-based scoring. Emits one row per document
    with each gate's boolean plus the conjunction, so a curation
    pipeline can both filter (`passes`) and audit WHICH rule fired
    (the flags are the debugging surface at 100 TB — a rule that
    suddenly drops 40% of a crawl is a bug signal, not a filter).

    Gates (each a pure column expression over one tokenization —
    whole-stage codegen, no shuffle, no UDF):
    * word count within [min_words, max_words];
    * mean word length within [min_mean_word_len, max_mean_word_len];
    * symbol-to-word ratio (# and ... occurrences / words) below
      max_symbol_ratio;
    * fraction of words containing an alphabetic character at least
      min_alpha_word_ratio;
    * at least min_stopword_hits DISTINCT stopwords present (the
      Gopher "stop word" coherence rule; EN_STOPWORDS is the engine's
      SQL-replicable list).

    Output: (id_col, *carry, n_words, flags..., passes). `carry`
    passes metadata columns through so composed pipelines never join
    back to the input (see normalize_text's docstring).
    """
    toked = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.coalesce(F.col(text_col), F.lit("")).alias("__txt"),
        # NULL text fails closed as an empty document (n_words=0, every
        # gate false) instead of poisoning the flags to NULL
        F.coalesce(
            tokens(F.col(text_col)), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    n = F.size("__toks")
    mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform("__toks", lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / n
    )
    hash_count = F.length("__txt") - F.length(F.regexp_replace("__txt", r"#", ""))
    ellipsis_count = (
        F.length("__txt") - F.length(F.regexp_replace("__txt", r"\.\.\.", ""))
    ) / 3
    symbol_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        (hash_count + ellipsis_count).cast("double") / n
    )
    alpha_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.filter("__toks", lambda t: t.rlike("[a-z]"))).cast("double") / n
    )
    sw_hits = F.size(
        F.array_intersect(
            F.array_distinct("__toks"),
            F.array(*[F.lit(w) for w in EN_STOPWORDS]),
        )
    )
    flags = toked.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n.cast("long").alias("n_words"),
        ((n >= min_words) & (n <= max_words)).alias("ok_words"),
        (
            (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
        ).alias("ok_mean_len"),
        (symbol_ratio < max_symbol_ratio).alias("ok_symbols"),
        (alpha_ratio >= min_alpha_word_ratio).alias("ok_alpha"),
        (sw_hits >= min_stopword_hits).alias("ok_stopwords"),
    )
    return flags.withColumn(
        "passes",
        F.col("ok_words")
        & F.col("ok_mean_len")
        & F.col("ok_symbols")
        & F.col("ok_alpha")
        & F.col("ok_stopwords"),
    )


def _sorted_nonempty_segments(text: Column, sep_regex: str) -> Column:
    """Trimmed, non-empty segments of `text` split on `sep_regex`,
    sorted. Edge-trim is FULL whitespace (regex \\s, not just spaces):
    splitting 3+ newlines on a two-newline paragraph separator leaves a
    stray leading newline on the next segment, and a paragraph that
    differs only by that stray IS a duplicate. Only equality-adjacency
    is consumed downstream, so the sort ORDER never has to match any
    other engine's collation — any total order groups equal segments
    together."""
    segs = F.filter(
        F.transform(
            F.split(text, sep_regex),
            lambda s: F.regexp_replace(s, r"^\s+|\s+$", ""),
        ),
        lambda s: s != "",
    )
    return F.array_sort(segs)


def _adjacent_dup_stats(s: Column):
    """(dup_occurrences, dup_chars, total_chars, n) over a SORTED string
    array: occurrences after the first of each distinct value, and the
    characters they carry. Single O(n) pass per row — no shuffle."""
    n = F.size(s)
    idx = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    is_dup = lambda i: F.element_at(s, i) == F.element_at(s, i - 1)
    dup_occ = F.size(F.filter(idx, is_dup))
    dup_chars = F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda a, i: a
        + F.when(is_dup(i), F.length(F.element_at(s, i))).otherwise(F.lit(0)),
    )
    total_chars = F.aggregate(
        s, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return dup_occ, dup_chars, total_chars, n


def _frac6(num: Column, den: Column) -> Column:
    """num/den rounded to 6dp, 0.0 when den is 0 — the engine/oracle
    float-parity convention (same as bm25_search's score rounding)."""
    return F.when(den == 0, F.lit(0.0)).otherwise(
        F.round(num.cast("double") / den.cast("double"), 6)
    )


def gopher_repetition_flags(
    df,
    id_col: str,
    text_col: str,
    line_sep: str = r"\n",
    para_sep: str = r"\n\n",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    top_ngram_max: tuple = ((2, 0.20), (3, 0.18), (4, 0.16)),
    dup_ngram_max: tuple = (
        (5, 0.15),
        (6, 0.14),
        (7, 0.13),
        (8, 0.12),
        (9, 0.11),
        (10, 0.10),
    ),
):
    """Gopher/MassiveText repetition battery (Rae et al. 2021,
    arXiv:2112.11446 §A.1.2) — the companion to `gopher_quality_flags`
    (§A.1.1): documents dominated by repeated lines, paragraphs, or
    n-grams are boilerplate/spam signals every production crawl filter
    removes before training. Reference parity: the reference's text
    pipeline exposes the same duplicate-line/top-n-gram signals as
    builtins (see SURVEY §2.5 text functions); this battery composes
    them into the published rule set.

    Thirteen gates, each a per-document fraction plus one `passes`
    conjunction (thresholds = the paper's Table A1 defaults):

    * duplicate line / paragraph fraction — occurrences after the first
      of each distinct trimmed segment over total segments;
    * duplicate line / paragraph CHARACTER fraction — characters carried
      by those repeat occurrences over total segment characters;
    * top-{2,3,4}-gram character fraction — max over word n-grams of
      occurrences x n-gram characters, over total token characters
      (deterministic variant: ties on count resolve by taking the max
      PRODUCT, so no tie-break ordering is needed on either engine;
      overlapping occurrences double-count tokens, so degenerate docs
      can score above 1.0 — faithful to the published definition, and
      irrelevant to the gate since any value above the threshold fails);
    * duplicated-{5..10}-gram character fraction — characters of tokens
      covered by at least one n-gram window that occurs >= 2 times
      (position-coverage counting, so overlapping duplicates are not
      double-counted), over total token characters.

    Everything is a pure column expression over one scan: per-row array
    ops (split/sort/adjacency/window-coverage), NO shuffle, NO UDF —
    the plan is Exchange-free like gopher_quality's (pinned in
    tests/test_plans.py). Intermediate arrays are materialized as real
    columns between select stages: Catalyst inlines lambda free
    expressions per element, so nesting `transform` trees would go
    O(len^2) (see shingles_from_tokens docstring for the measured
    pitfall).

    Character bases: segment metrics use trimmed segment lengths
    (intra-segment spaces included); n-gram metrics use total TOKEN
    characters (inter-token spaces excluded) — both replicated exactly
    in the DuckDB oracle. Fractions are rounded to 6dp BEFORE the
    threshold comparison so the boolean boundary agrees bit-for-bit
    with the oracle. NULL text fails closed as an empty document
    (every fraction 0.0, passes true).

    Output: (id_col, dup_line_frac, dup_line_char_frac, dup_para_frac,
    dup_para_char_frac, top_{n}gram_char_frac..., dup_{n}gram_char_frac...,
    passes).
    """
    # r13: every higher-order expression here is built as ONE
    # F.expr(SQL) instead of the F.transform/F.aggregate lambda API —
    # semantics are IDENTICAL (same Spark functions, same lambda
    # bodies), but the lambda API costs ~10-30 py4j round-trips per
    # call and this battery has ~54 of them: cProfile measured 4.2 s of
    # the query's 4.7 s CONSTRUCTION inside py4j socket reads (7,892
    # round-trips), while execution is 0.18 s. The expr form builds in
    # ~60 round-trips. Oracle parity and the old/new differential pin
    # the equivalence.
    def _sql_str(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    _ws_re = _sql_str(r"^\s+|\s+$")

    def _segments_sql(txt_sql: str, sep: str) -> str:
        # _sorted_nonempty_segments in SQL form
        return (
            f"array_sort(filter(transform(split({txt_sql}, {_sql_str(sep)}),"
            f" s -> regexp_replace(s, {_ws_re}, '')), s -> s != ''))"
        )

    txt_sql = f"coalesce(`{text_col}`, '')"
    toks_sql = (
        f"filter(split(lower(trim({txt_sql})), '[^a-z0-9\\']+'), t -> t != '')"
    )
    base = df.select(
        F.col(id_col),
        F.expr(_segments_sql(txt_sql, line_sep)).alias("__lines"),
        F.expr(_segments_sql(txt_sql, para_sep)).alias("__paras"),
        F.expr(
            f"coalesce({toks_sql}, cast(array() as array<string>))"
        ).alias("__toks"),
    )

    # stage 1: n-gram arrays (positional + sorted), one materialized
    # column per n so no lambda subtree is re-evaluated per element
    gram_cols = []
    ns_top = [n for n, _ in top_ngram_max]
    ns_dup = [n for n, _ in dup_ngram_max]
    for n in sorted(set(ns_top) | set(ns_dup)):
        gram_cols.append(
            F.expr(
                f"IF(size(__toks) >= {n},"
                f" transform(sequence(0, greatest(size(__toks) - {n - 1}, 1) - 1),"
                f" i -> concat_ws(' ', slice(__toks, i + 1, {n}))),"
                f" cast(array() as array<string>))"
            ).alias(f"__g{n}")
        )
    staged = base.select("*", *gram_cols)
    sorted_cols = [
        F.array_sort(f"__g{n}").alias(f"__s{n}") for n in sorted(set(ns_top) | set(ns_dup))
    ]
    staged = staged.select("*", *sorted_cols)

    # stage 2: duplicated n-gram value sets (adjacent dups of the sorted
    # array) + positional duplicate flags, for the coverage metrics
    dupval_cols = [
        F.expr(
            f"array_distinct(filter(transform("
            f"IF(size(__s{n}) >= 2, sequence(2, size(__s{n})),"
            f" cast(array() as array<int>)),"
            f" i -> IF(element_at(__s{n}, i) = element_at(__s{n}, i - 1),"
            f" element_at(__s{n}, i), NULL)), x -> x is not null))"
        ).alias(f"__dv{n}")
        for n in ns_dup
    ]
    staged = staged.select("*", *dupval_cols)

    flag_cols = [
        F.expr(
            f"transform(__g{n}, g -> array_contains(__dv{n}, g))"
        ).alias(f"__f{n}")
        for n in ns_dup
    ]
    staged = staged.select("*", *flag_cols)

    # stage 3: the scalar metrics (_adjacent_dup_stats in SQL form)
    def _dup_stats_sql(col: str):
        idx = (
            f"IF(size({col}) >= 2, sequence(2, size({col})),"
            f" cast(array() as array<int>))"
        )
        is_dup = f"element_at({col}, i) = element_at({col}, i - 1)"
        occ = F.expr(f"size(filter({idx}, i -> {is_dup}))")
        chars = F.expr(
            f"aggregate({idx}, cast(0 as bigint),"
            f" (a, i) -> a + IF({is_dup}, length(element_at({col}, i)), 0))"
        )
        total = F.expr(
            f"aggregate({col}, cast(0 as bigint), (a, x) -> a + length(x))"
        )
        return occ, chars, total, F.size(col)

    line_occ, line_chars, line_total, n_lines = _dup_stats_sql("__lines")
    para_occ, para_chars, para_total, n_paras = _dup_stats_sql("__paras")
    tok_chars = F.expr(
        "aggregate(__toks, cast(0 as bigint), (a, x) -> a + length(x))"
    )

    metric_cols = [
        _frac6(line_occ, n_lines).alias("dup_line_frac"),
        _frac6(line_chars, line_total).alias("dup_line_char_frac"),
        _frac6(para_occ, n_paras).alias("dup_para_frac"),
        _frac6(para_chars, para_total).alias("dup_para_char_frac"),
    ]
    for n, _thr in top_ngram_max:
        # RLE fold over the sorted grams: best = max over values of
        # occurrences x (gram chars minus the n-1 joining spaces);
        # the running product peaks exactly at each run's last element
        run = f"IF(x = acc.prev, acc.run + 1, cast(1 as bigint))"
        best = F.expr(
            f"aggregate(__s{n},"
            f" named_struct('prev', '', 'run', cast(0 as bigint),"
            f" 'best', cast(0 as bigint)),"
            f" (acc, x) -> named_struct('prev', x, 'run', {run},"
            f" 'best', greatest(acc.best,"
            f" {run} * cast(length(x) - {n - 1} as bigint))),"
            f" acc -> acc.best)"
        )
        metric_cols.append(_frac6(best, tok_chars).alias(f"top_{n}gram_char_frac"))
    for n, _thr in dup_ngram_max:
        # token j (1-based) is covered iff any n-gram window containing
        # it is duplicated: flag positions [max(j-n+1,1), min(j, m_g)]
        start = f"greatest(j - {n - 1}, 1)"
        covered = F.expr(
            f"aggregate("
            f"IF(size(__f{n}) >= 1, sequence(1, size(__toks)),"
            f" cast(array() as array<int>)),"
            f" cast(0 as bigint),"
            f" (a, j) -> a + IF(exists(slice(__f{n}, {start},"
            f" least(j, size(__f{n})) - {start} + 1), f -> f),"
            f" length(element_at(__toks, j)), 0))"
        )
        metric_cols.append(_frac6(covered, tok_chars).alias(f"dup_{n}gram_char_frac"))

    out = staged.select(F.col(id_col), *metric_cols)
    gates = [
        F.col("dup_line_frac") <= max_dup_line_frac,
        F.col("dup_line_char_frac") <= max_dup_line_char_frac,
        F.col("dup_para_frac") <= max_dup_para_frac,
        F.col("dup_para_char_frac") <= max_dup_para_char_frac,
    ]
    gates += [
        F.col(f"top_{n}gram_char_frac") <= thr for n, thr in top_ngram_max
    ]
    gates += [
        F.col(f"dup_{n}gram_char_frac") <= thr for n, thr in dup_ngram_max
    ]
    passes = gates[0]
    for g in gates[1:]:
        passes = passes & g
    return out.withColumn("passes", passes)


def normalize_text(df, id_col: str, text_col: str, carry: tuple = ()):
    """Text canonicalization — the normalization pass every corpus gets
    before dedup/tokenization (C4/CCNet/RefinedWeb all run one):
    mixed NFC/NFD crawl encodings make byte-identical texts hash
    differently, so exact dedup UNDER-deduplicates and token stats
    drift unless the corpus is normalized first.

    Steps, in order:
    1. Line-ending canonicalization: \\r\\n and bare \\r -> \\n.
    2. Strip C0 control chars except tab/newline (+ DEL).
    3. Unicode NFC (composed form: 'e'+U+0301 -> U+00E9, singleton
       compatibility points like U+212B ANGSTROM -> U+00C5). Spark has
       no JVM-side unicode-normalize builtin, so this is the one
       justified Python step — an Arrow-batched pandas_udf over
       stdlib `unicodedata` (same class as compression_ratio's zlib
       kernel; never row-at-a-time).
    4. Collapse runs of spaces/tabs to one space.
    5. Trim spaces around newlines (line-edge whitespace).
    6. Collapse 3+ newlines to a paragraph break (two).
    7. Trim outer whitespace.
    The C0 strip runs BEFORE the NFC kernel (ADVICE r10): a control
    char between a base and a combining mark blocks canonical
    composition, so stripping it afterwards left non-NFC output and
    broke normalize(normalize(x)) == normalize(x) — the exact property
    exact-dedup relies on. Steps 4-7 can't break NFC-ness: they only
    delete/collapse ASCII whitespace and never create a new
    base+combining-mark adjacency (runs collapse to one char, trims
    happen at string edges or around a surviving newline). Steps 1-2
    and 4-7 are JVM-side codegen'd regexp_replace chains; the DuckDB
    oracle replicates the identical chain around `nfc_normalize` (both
    utf8proc and CPython implement the same stable Unicode NFC).

    NULL text fails closed to '' with changed=true. Output:
    (id_col, *carry, norm_text, changed). One scan, no shuffle; the
    pandas_udf is the only non-codegen stage (ArrowEvalPython,
    plan-pinned). `carry` names metadata columns to pass through —
    composing pipelines MUST carry metadata here instead of joining
    back to the input (a join-back re-evaluates the whole upstream
    subtree per branch: the v1 web_pipeline's join-back plan measured
    8x growth at 100x; the carry version is scan-flat).
    """
    import pandas as pd

    @F.pandas_udf("string")
    def _nfc(batch: pd.Series) -> pd.Series:
        import unicodedata

        return batch.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # The kernel IS deterministic; the flag pins it to ONE evaluation
    # site. Without it, Catalyst's filter-pushdown substitutes the
    # whole expression tree into downstream filter conditions — a
    # composed pipeline (e.g. web_pipeline's .filter("keep")) then runs
    # the Arrow transfer + NFC once per consuming operator (measured: 2
    # stacked ArrowEvalPython nodes over one scan).
    _nfc = _nfc.asNondeterministic()

    pre = F.coalesce(F.col(text_col), F.lit(""))
    pre = F.regexp_replace(pre, r"\r\n|\r", "\n")
    pre = F.regexp_replace(pre, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    norm = _nfc(pre)
    norm = F.regexp_replace(norm, r"[ \t]+", " ")
    norm = F.regexp_replace(norm, r" *\n *", "\n")
    norm = F.regexp_replace(norm, r"\n{3,}", "\n\n")
    norm = F.regexp_replace(norm, r"^\s+|\s+$", "")
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col(text_col),
        norm.alias("norm_text"),
    )
    return staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("norm_text"),
        F.when(F.col(text_col).isNull(), F.lit(True))
        .otherwise(F.col("norm_text") != F.col(text_col))
        .alias("changed"),
    )


def c4_clean(
    df,
    id_col: str,
    text_col: str,
    line_sep: str = r"\n",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple = (),
    carry: tuple = (),
):
    """C4 cleaning battery (Raffel et al. 2020, arXiv:1910.10683 §2.2)
    — the line- and page-level heuristics that produced C4 from Common
    Crawl, the most-replicated cleaning recipe in LLM data work:

    Line filters (applied to `line_sep` segments, surviving lines are
    re-joined into `clean_text`):
    * keep only lines ending in terminal punctuation (. ! ? or a
      closing double quote after one);
    * drop lines with fewer than min_words_per_line words;
    * drop lines containing the word "javascript" (case-insensitive).

    Page filters (each a boolean column; `keep` is the conjunction
    evaluated on the CLEANED text):
    * at least min_sentences sentences (terminal-punct splits of the
      cleaned text with a non-empty remainder);
    * no word from `badwords` (token-level, lowercase; the published
      pipeline uses the "List of Dirty, Naughty, Obscene..." list —
      pass your deployment's list, the default is empty);
    * no "lorem ipsum" substring (lowercase match, raw text);
    * no curly brace (raw text — the code/markup signal).

    Pure column expressions over one scan (split / filter / array ops
    / regexp), no shuffle, no UDF — same Exchange-free plan class as
    the Gopher batteries (plan-pinned). NULL text fails closed to an
    empty page: clean_text '', every gate's signal false, keep false
    (zero sentences).

    Output: (id_col, *carry, clean_text, n_lines_kept, n_sentences,
    has_badword, has_lorem_ipsum, has_brace, keep). `carry` passes
    metadata columns through — compose with carry, never join back to
    the input (a join-back re-evaluates the upstream subtree per
    branch; see normalize_text's docstring for the measured cost).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    # Whitespace contract (ADVICE r11): the edge-trim / word-split class
    # is the EXPLICIT ASCII set [ \t\n\x0B\f\r] — written out rather
    # than `\s` because the three implementations disagree on `\s`
    # (Java \s = this set; DuckDB's RE2 \s excludes \x0B; Python
    # .strip() is full Unicode, e.g. NBSP/U+2028). All three sites
    # (here, the DuckDB oracle, the pure-Python differential reference)
    # share this class verbatim, so NBSP-edged lines behave identically
    # everywhere: NBSP is NOT whitespace to this operator.
    _ws = r"[ \t\n\x0B\f\r]"
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        txt.alias("__txt"),
        F.filter(
            F.transform(
                F.split(txt, line_sep),
                lambda s: F.regexp_replace(s, f"^{_ws}+|{_ws}+$", ""),
            ),
            lambda s: s != "",
        ).alias("__lines"),
    )

    def _line_ok(s):
        ends_punct = s.rlike('[.!?]"?$')
        enough_words = F.size(F.filter(F.split(s, f"{_ws}+"), lambda w: w != "")) >= (
            min_words_per_line
        )
        no_js = ~F.lower(s).rlike(r"(^|[^a-z0-9])javascript([^a-z0-9]|$)")
        return ends_punct & enough_words & no_js

    kept = base.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.col("__txt"),
        F.filter(F.col("__lines"), _line_ok).alias("__kept"),
    )
    clean = F.concat_ws("\n", F.col("__kept"))
    # sentences: terminal-punct splits of the cleaned text that leave a
    # non-empty remainder (deterministic and engine-portable)
    n_sentences = F.size(
        F.filter(
            F.transform(
                F.split(clean, r"[.!?]"),
                lambda s: F.regexp_replace(s, f"^{_ws}+|{_ws}+$", ""),
            ),
            lambda s: s != "",
        )
    )
    toks = F.coalesce(tokens(clean), F.array().cast("array<string>"))
    if badwords:
        has_bad = (
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(w.lower()) for w in badwords]),
                )
            )
            > 0
        )
    else:
        has_bad = F.lit(False)
    has_lorem = F.lower(F.col("__txt")).contains("lorem ipsum")
    has_brace = F.col("__txt").contains("{") | F.col("__txt").contains("}")
    staged = kept.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        clean.alias("clean_text"),
        F.size("__kept").cast("long").alias("n_lines_kept"),
        n_sentences.cast("long").alias("n_sentences"),
        has_bad.alias("has_badword"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
    )
    return staged.withColumn(
        "keep",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_badword")
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_brace"),
    )
