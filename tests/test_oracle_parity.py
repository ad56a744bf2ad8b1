"""Driver-style differential test: every queries() entry vs its
oracle_sql() through DuckDB on the same parquet, compared as sorted
multisets with float tolerance (mimics CORRECTNESS_r{N}.json gate)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    try:
        import datetime

        if isinstance(v, datetime.datetime):
            return v.replace(tzinfo=None).isoformat()
    except Exception:
        pass
    return v


def _rows(recs, colnames):
    # driver sorts columns by name before hashing — mimic
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in recs:
        out.append(tuple(_norm(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _approx_equal(a, b, rel=1e-6, abs_tol=1e-9):
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, f"arity at row {i}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=rel, abs_tol=abs_tol):
                    return False, f"row {i}: {va} vs {vb}"
            elif va != vb:
                return False, f"row {i}: {va!r} vs {vb!r}"
    return True, ""


def _entry():
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__spark_entry__")


ENTRY = _entry()
ORACLES = ENTRY.oracle_sql()
QUERIES = ENTRY.queries()


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, name):
    qfn = QUERIES[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = _rows([tuple(r) for r in sdf.collect()], scols)

    con = _duck()
    res = con.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = _rows(res.fetchall(), dcols)

    assert sorted(scols) == sorted(dcols), f"columns {scols} vs {dcols}"
    ok, why = _approx_equal(srows, drows)
    assert ok, f"{name}: {why}\nspark[:3]={srows[:3]}\nduck[:3]={drows[:3]}"


def test_no_decimal_typed_oracle_columns():
    """VERDICT r10 #1 class-guard: DuckDB sum()/arithmetic silently
    yields HUGEINT (arrow decimal128), which the engine never emits
    (Spark sums are LongType) — and the driver's value hash is
    type-sensitive, so a decimal column is a guaranteed red row even
    with byte-identical values (the r10 `bpe_merges` artifact). Assert
    every oracle's arrow schema is decimal-free; fix sites with
    `::BIGINT` casts."""
    con = _duck()
    offenders = []
    for name, sql in sorted(ORACLES.items()):
        tb = con.execute(sql).fetch_arrow_table()
        for f in tb.schema:
            if str(f.type).startswith("decimal"):
                offenders.append((name, f.name, str(f.type)))
    assert not offenders, f"decimal-typed oracle columns: {offenders}"


def test_rows_only_queries_run(spark):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 3


def test_compression_signal_value_parity(spark):
    """VERDICT r7 #3: close the one oracle hole. The driver's DuckDB
    oracle can't express zlib, but DuckDB supports registered Python
    UDFs — run the SAME zlib ratio as a DuckDB scalar UDF and compare
    full values, not just row counts."""
    import zlib

    name = "compression_signal"
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = _rows([tuple(r) for r in sdf.collect()], scols)

    def zratio(s):
        if s is None or len(s) == 0:
            return 1.0
        raw = s.encode("utf-8", "ignore")
        return len(zlib.compress(raw, 6)) / len(raw)

    con = _duck()
    con.create_function(
        "zratio",
        zratio,
        [duckdb.typing.VARCHAR],
        duckdb.typing.DOUBLE,
        null_handling="special",
    )
    res = con.execute(
        "SELECT * FROM (SELECT doc_id, zratio(text) AS zratio FROM documents) WHERE zratio >= 0.25"
    )
    dcols = [d[0] for d in res.description]
    drows = _rows(res.fetchall(), dcols)
    assert sorted(scols) == sorted(dcols), f"columns {scols} vs {dcols}"
    ok, why = _approx_equal(srows, drows)
    assert ok, f"{name}: {why}\nspark[:3]={srows[:3]}\nduck[:3]={drows[:3]}"
