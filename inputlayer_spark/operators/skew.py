"""Skew-mitigation join helpers.

AQE's skew-join splitting (on by default, session.py) handles moderate
skew by splitting oversized shuffle partitions. For EXTREME hot keys —
one key holding a double-digit percentage of a 100 TB fact table —
explicit salting is still the reliable tool: the big side's hot keys are
sharded across `salt` sub-keys, the small side replicates each hot key
`salt` times, and the join key becomes (key, salt). The hot key's rows
then spread over `salt` tasks instead of one straggler.

Only the small side is replicated (×salt on its hot-key rows), so the
extra volume is negligible; the big side gains one narrow column.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    salt: int = 16,
    how: str = "inner",
    hot_keys: Optional[DataFrame] = None,
) -> DataFrame:
    """Equi-join with hot-key salting on the big side.

    `hot_keys`: optional single-column-per-key DataFrame restricting
    salting to known hot keys (rows with other keys join un-salted with
    salt 0, so the small side's replication stays tiny). Without it,
    every key is salted — simplest, still correct.

    Column sets must be disjoint apart from the join keys (standard
    `join(on=...)` contract). Result columns match `big.join(small, on)`.

    Only `how` ∈ {inner, left/left_outer/leftouter} is supported
    (VERDICT r12 #3): the small side's hot-key rows are replicated
    ×salt, so a RIGHT or FULL join would null-extend every unmatched
    replica — up to `salt` duplicate preserved-side rows per hot key.
    Inner joins drop unmatched replicas and left joins preserve only
    the (un-replicated) big side, so both are exact; anything else
    raises rather than silently duplicating.
    """
    if how.lower().replace("_", "") not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports how='inner' or 'left' only, got {how!r}: "
            "the small side is replicated per salt, so right/full joins "
            "would emit duplicate preserved-side rows for unmatched "
            "hot-key replicas"
        )
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    salt_col = "__salt"

    if hot_keys is not None:
        hot = hot_keys.toDF(*keys).withColumn("__is_hot", F.lit(True))
        big2 = big.join(F.broadcast(hot), on=keys, how="left")
        big2 = big2.withColumn(
            salt_col,
            F.when(
                F.col("__is_hot").isNotNull(),
                (F.rand(seed=7) * salt).cast("int"),
            ).otherwise(F.lit(0)),
        ).drop("__is_hot")
        rep = small.join(F.broadcast(hot), on=keys, how="left")
        rep = rep.withColumn(
            "__salts",
            F.when(
                F.col("__is_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(salt - 1)),
            ).otherwise(F.array(F.lit(0))),
        ).drop("__is_hot")
    else:
        big2 = big.withColumn(salt_col, (F.rand(seed=7) * salt).cast("int"))
        rep = small.withColumn(
            "__salts", F.sequence(F.lit(0), F.lit(salt - 1))
        )
    small2 = rep.withColumn(salt_col, F.explode("__salts")).drop("__salts")
    out = big2.join(small2, on=keys + [salt_col], how=how)
    return out.drop(salt_col)
