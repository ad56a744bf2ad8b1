"""Vector builtins as Spark Column expressions.

Parity targets (semantics, not code) from the reference
`/root/reference/src/vector_ops.rs`:
  euclidean :87, cosine :139 (returns 1 - similarity, i.e. a distance),
  dot :175, manhattan :194, hamming :232, normalize :390, vec_add :402,
  vec_scale :410, vec_dim :416, vector_norm :381,
  quantize_linear :450 (min-max → [-128,127]), quantize_symmetric :487
  (±max_abs → ±127, zero-preserving), dequantize :535, dequantize_scaled
  :547, int8 distances :562+, lsh_bucket :1038 (sign hash over
  deterministic per-table hyperplanes).

Everything is a JVM-side higher-order-function expression — no Python UDFs
— so whole-stage codegen applies and 100 TB scans stay vectorized.
All arithmetic is done in double precision (elements are cast) so results
match a float64 oracle to ~1e-12 regardless of input being float32.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def lit_vec(values, element_type: str = "float") -> Column:
    """Literal vector column via ONE F.expr round-trip (r13): the
    per-element `F.array(*[F.lit(float(x)) ...])` form costs two py4j
    round-trips per component (~0.2 s per 64-dim literal at query
    construction time). repr(float) is the shortest exact round-trip
    decimal, and Spark SQL parses it back to the identical double, so
    the literal is bit-equal to the F.lit form. Finite values only.

    The SQL text rides along on the Column (`__dict__`-stored, so it
    never collides with Column.__getattr__ field access): the distance
    builders below embed it into their own single-F.expr form."""
    body = ",".join(repr(float(v)) for v in values)
    sql = f"cast(array({body}) as array<{element_type}>)"
    col = F.expr(sql)
    col.__dict__["_ilspark_sql"] = f"({sql})"
    return col


# ---- single-round-trip construction (r14, guide §5/§7.3) ----
#
# The distance builders are called at query-construction time on the
# driver; their Column form costs 2-4 higher-order-function lambdas ≈
# 40-80 py4j round-trips per call (measured 0.13-0.17 s of knn_cosine /
# pairwise_cosine build time). When an operand is a column NAME (str)
# or a lit_vec literal (SQL text attached above), the whole expression
# renders as ONE F.expr — the parser builds the identical tree (same
# functions, same lambda bodies, same double literals), so results are
# bit-equal. Column operands keep the original construction.

_SQL_INF = "CAST('Infinity' AS DOUBLE)"


def _sqlref(x) -> str | None:
    if isinstance(x, str):
        return "`" + x.replace("`", "``") + "`"
    d = getattr(x, "__dict__", None)
    return d.get("_ilspark_sql") if isinstance(d, dict) else None


def _colref(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" 0.0D, (acc, x) -> acc + x)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x ->"
        f" CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        f" 0.0D, (acc, x) -> acc + x))"
    )


def vec_dim(a) -> Column:
    return F.size(_colref(a)).cast("long")


def dot(a, b) -> Column:
    """Dot product; infinity on dimension mismatch (vector_ops.rs:175)."""
    sa, sb = _sqlref(a), _sqlref(b)
    if sa is not None and sb is not None:
        return F.expr(
            f"CASE WHEN size({sa}) != size({sb}) THEN {_SQL_INF}"
            f" ELSE {_dot_sql(sa, sb)} END"
        )
    a, b = _colref(a), _colref(b)
    raw = F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def vector_norm(a) -> Column:
    sa = _sqlref(a)
    if sa is not None:
        return F.expr(_norm_sql(sa))
    a = _colref(a)
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: _d(x) * _d(x)), F.lit(0.0), lambda acc, x: acc + x)
    )


def euclidean(a, b) -> Column:
    sa, sb = _sqlref(a), _sqlref(b)
    if sa is not None and sb is not None:
        raw = (
            f"sqrt(aggregate(zip_with({sa}, {sb}, (x, y) ->"
            f" (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
            f" * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
            f" 0.0D, (acc, x) -> acc + x))"
        )
        return F.expr(
            f"CASE WHEN size({sa}) != size({sb}) THEN {_SQL_INF}"
            f" ELSE {raw} END"
        )
    a, b = _colref(a), _colref(b)
    raw = F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def manhattan(a, b) -> Column:
    sa, sb = _sqlref(a), _sqlref(b)
    if sa is not None and sb is not None:
        raw = (
            f"aggregate(zip_with({sa}, {sb}, (x, y) ->"
            f" abs(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
            f" 0.0D, (acc, x) -> acc + x)"
        )
        return F.expr(
            f"CASE WHEN size({sa}) != size({sb}) THEN {_SQL_INF}"
            f" ELSE {raw} END"
        )
    a, b = _colref(a), _colref(b)
    raw = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(raw)


def cosine(a, b) -> Column:
    """Cosine *distance* = 1 − cosine similarity (vector_ops.rs:139).

    Zero-norm input → distance 0.0 ("treat zero vectors as identical",
    vector_ops.rs:158-160); similarity clamped to [-1, 1] before the
    subtraction, as the reference does.
    """
    sa, sb = _sqlref(a), _sqlref(b)
    if sa is not None and sb is not None:
        num = _dot_sql(sa, sb)
        na, nb = _norm_sql(sa), _norm_sql(sb)
        sim = f"least(greatest({num} / ({na} * {nb}), -1.0D), 1.0D)"
        dist = (
            f"CASE WHEN ({na} = 0.0D) OR ({nb} = 0.0D) THEN 0.0D"
            f" ELSE 1.0D - {sim} END"
        )
        return F.expr(
            f"CASE WHEN size({sa}) != size({sb}) THEN {_SQL_INF}"
            f" ELSE {dist} END"
        )
    a, b = _colref(a), _colref(b)
    num = F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)), F.lit(0.0), lambda acc, x: acc + x
    )
    na, nb = vector_norm(a), vector_norm(b)
    sim = F.least(F.greatest(num / (na * nb), F.lit(-1.0)), F.lit(1.0))
    dist = F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(F.lit(1.0) - sim)
    return F.when(F.size(a) != F.size(b), F.lit(float("inf"))).otherwise(dist)


def hamming(a: Column, b: Column) -> Column:
    """Count of differing positions (vector_ops.rs:232)."""
    raw = F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda t: t)).cast("long")
    return F.when(F.size(a) != F.size(b), F.lit(None).cast("long")).otherwise(raw)


def normalize(a: Column) -> Column:
    n = vector_norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: _d(x) / n)
    )


def vec_add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: _d(x) + _d(y))


def vec_scale(a: Column, s: Column) -> Column:
    return F.transform(a, lambda x: _d(x) * _d(s))


# ------------------------------------------------------------ quantization


def quantize_linear(a: Column) -> Column:
    """Min-max quantize to int8: min→-128, max→127 (vector_ops.rs:450)."""
    mn = F.array_min(a).cast("double")
    mx = F.array_max(a).cast("double")
    rng = mx - mn
    return F.when(rng == 0.0, F.transform(a, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            a,
            lambda x: F.greatest(
                F.lit(-128.0),
                F.least(F.lit(127.0), F.round((_d(x) - mn) / rng * 255.0 - 128.0)),
            ).cast("tinyint"),
        )
    )


def quantize_symmetric(a: Column) -> Column:
    """Symmetric quantize: ±max_abs → ±127, 0 → 0 (vector_ops.rs:487)."""
    max_abs = F.array_max(F.transform(a, lambda x: F.abs(_d(x))))
    scale = F.lit(127.0) / max_abs
    return F.when(max_abs == 0.0, F.transform(a, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            a,
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.round(_d(x) * scale))
            ).cast("tinyint"),
        )
    )


def dequantize(a: Column) -> Column:
    """int8 → double verbatim (vector_ops.rs:535)."""
    return F.transform(a, lambda x: _d(x))


def dequantize_scaled(a: Column, scale: Column) -> Column:
    return F.transform(a, lambda x: _d(x) * _d(scale))


# int8 distances are the same expressions — elements cast to double anyway.
euclidean_int8 = euclidean
cosine_int8 = cosine
dot_int8 = dot
manhattan_int8 = manhattan


# ------------------------------------------------------------ LSH

# Reference-exact deterministic random-hyperplane family. The reference
# derives every hyperplane coefficient from a seeded PRNG:
# DefaultHasher (SipHash-1-3, keys (0,0)) over the u64 seed
# table*1_000_000_007 + h*31337 + d, low 32 bits mapped to [-1, 1] as f32
# (vector_ops.rs:891-927). Replicating SipHash-1-3 here reproduces the
# reference's bucket ids bit-for-bit (goldens 31_lsh/01..05,
# 16_vectors/10), so LSH results are portable across both engines.

import struct
from functools import lru_cache

import numpy as np
import pandas as pd

_SIP_MASK = (1 << 64) - 1


def _rotl64(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _SIP_MASK


def _sipround(v0, v1, v2, v3):
    v0 = (v0 + v1) & _SIP_MASK
    v1 = _rotl64(v1, 13) ^ v0
    v0 = _rotl64(v0, 32)
    v2 = (v2 + v3) & _SIP_MASK
    v3 = _rotl64(v3, 16) ^ v2
    v0 = (v0 + v3) & _SIP_MASK
    v3 = _rotl64(v3, 21) ^ v0
    v2 = (v2 + v1) & _SIP_MASK
    v1 = _rotl64(v1, 17) ^ v2
    v2 = _rotl64(v2, 32)
    return v0, v1, v2, v3


def _siphash13(data: bytes) -> int:
    """SipHash-1-3 with zero keys — Rust std DefaultHasher::new()."""
    v0 = 0x736F6D6570736575
    v1 = 0x646F72616E646F6D
    v2 = 0x6C7967656E657261
    v3 = 0x7465646279746573
    n = len(data)
    i = 0
    while i + 8 <= n:
        m = int.from_bytes(data[i : i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m
        i += 8
    b = (n & 0xFF) << 56 | int.from_bytes(data[i:n], "little")
    v3 ^= b
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= b
    v2 ^= 0xFF
    for _ in range(3):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _SIP_MASK


def _rand_f32(seed: int) -> float:
    bits = _siphash13(struct.pack("<Q", seed & _SIP_MASK)) & 0xFFFFFFFF
    unit = bits / 0xFFFFFFFF
    return struct.unpack("f", struct.pack("f", unit * 2.0 - 1.0))[0]


@lru_cache(maxsize=512)
def _ref_planes(table: int, num_bits: int, dim: int):
    """(num_bits, dim) float32 hyperplane matrix, identical to the
    reference's generate_hyperplanes (vector_ops.rs:909-927)."""
    data = [
        _rand_f32((table * 1_000_000_007 + h * 31337 + d) & _SIP_MASK)
        for h in range(min(num_bits, 62))
        for d in range(dim)
    ]
    return np.asarray(data, dtype=np.float32).reshape(min(num_bits, 62), dim)


def _ref_bucket(v, table: int, num_bits: int) -> int:
    """f32-accumulated sign hash (vector_ops.rs:991-1003)."""
    if v is None or len(v) == 0 or num_bits <= 0:
        return 0
    x = np.asarray(v, dtype=np.float32)
    dots = _ref_planes(table, num_bits, len(x)) @ x
    bucket = 0
    for h, d in enumerate(dots):
        if d > 0.0:
            bucket |= 1 << h
    return bucket


def _ref_probes(bucket: int, num_bits: int, num_probes: int):
    """Hamming-ball probe order: self, 1-bit flips, 2-bit flips
    (vector_ops.rs:1127-1160)."""
    if num_probes <= 0:
        return []
    nb = min(num_bits, 62)
    probes = [bucket]
    for bit in range(nb):
        if len(probes) >= num_probes:
            return probes
        probes.append(bucket ^ (1 << bit))
    for i in range(nb):
        for j in range(i + 1, nb):
            if len(probes) >= num_probes:
                return probes
            probes.append(bucket ^ (1 << i) ^ (1 << j))
    return probes


def _ref_multi_probe(v, table: int, num_bits: int, num_probes: int):
    """Boundary-distance-ranked probes (lsh_bucket_with_distances f64
    accumulation + lsh_probes_ranked, vector_ops.rs:1198-1400)."""
    if num_probes <= 0:
        return []
    if v is None or len(v) == 0 or num_bits <= 0:
        return [0]
    x64 = np.asarray(v, dtype=np.float64)
    planes = _ref_planes(table, num_bits, len(x64)).astype(np.float64)
    dots = planes @ x64
    bucket = 0
    for h, d in enumerate(dots):
        if d > 0.0:
            bucket |= 1 << h
    order = sorted(range(len(dots)), key=lambda h: abs(dots[h]))
    probes = [bucket]
    for bit in order:
        if len(probes) >= num_probes:
            return probes
        probes.append(bucket ^ (1 << bit))
    for i in range(len(order)):
        for j in range(i + 1, len(order)):
            if len(probes) >= num_probes:
                return probes
            probes.append(bucket ^ (1 << order[i]) ^ (1 << order[j]))
    for i in range(len(order)):
        for j in range(i + 1, len(order)):
            for k in range(j + 1, len(order)):
                if len(probes) >= num_probes:
                    return probes
                probes.append(
                    bucket ^ (1 << order[i]) ^ (1 << order[j]) ^ (1 << order[k])
                )
    return probes


def lsh_bucket(a: Column, table: int = 0, num_bits: int = 16) -> Column:
    """Sign-hash bucket id in [0, 2^num_bits) (vector_ops.rs:1038).

    Arrow-batched pandas kernel: the hyperplane family is the reference's
    seeded-SipHash PRNG (not expressible as a JVM hash), the planes matrix
    is cached per (table, bits, dim), and the per-batch work is one
    float32 matmul. The scale-path dedup/similarity operators keep their
    all-JVM xxhash64 family (operators/dedup.py)."""
    from pyspark.sql.functions import pandas_udf

    t, nb = int(table), min(int(num_bits), 62)

    @pandas_udf("long")
    def _bucket(s: pd.Series) -> pd.Series:
        # vectorized per Arrow batch: group rows by dimension and compute
        # one (rows x dim) @ (dim x bits) f32 matmul per group — orders of
        # magnitude over per-row Python on wide corpora
        arrs = s.tolist()
        dims = [len(v) if v is not None else 0 for v in arrs]
        out = np.zeros(len(arrs), dtype=np.int64)
        for dim in set(dims):
            if dim == 0 or nb <= 0:
                continue
            idx = [i for i, d in enumerate(dims) if d == dim]
            m = np.asarray([arrs[i] for i in idx], dtype=np.float32)
            dots = m @ _ref_planes(t, nb, dim).T  # (n, nb) float32
            bits = (dots > 0.0).astype(np.int64)
            out[idx] = (bits << np.arange(nb, dtype=np.int64)).sum(axis=1)
        return pd.Series(out)

    return _bucket(a)


def lsh_probes(bucket: Column, num_bits: int = 16, num_probes: int = 8) -> Column:
    """lsh_probes(bucket, num_hyperplanes, num_probes) → probe buckets as a
    float32 vector (the reference casts probe ids to f32,
    code_generator/mod.rs:3030-3041). Pure bit math over literal masks —
    stays JVM-side."""
    nb, np_ = min(int(num_bits), 62), int(num_probes)
    if np_ <= 0:
        return F.array().cast("array<float>")
    masks = [0]
    for bit in range(nb):
        if len(masks) >= np_:
            break
        masks.append(1 << bit)
    if len(masks) < np_:
        for i in range(nb):
            for j in range(i + 1, nb):
                if len(masks) >= np_:
                    break
                masks.append((1 << i) | (1 << j))
            if len(masks) >= np_:
                break
    b = bucket.cast("long")
    return F.array(
        *[b.bitwiseXOR(F.lit(m).cast("long")).cast("float") for m in masks]
    )


def lsh_multi_probe(
    a: Column, table: int = 0, num_bits: int = 16, num_probes: int = 8
) -> Column:
    """lsh_multi_probe(v, table_idx, num_hyperplanes, num_probes) →
    boundary-ranked probe buckets as a float32 vector
    (vector_ops.rs:1392-1400)."""
    from pyspark.sql.functions import pandas_udf

    t, nb, np_ = int(table), min(int(num_bits), 62), int(num_probes)

    @pandas_udf("array<float>")
    def _probes(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: [float(p) for p in _ref_multi_probe(v, t, nb, np_)]
        )

    return _probes(a)
