"""Hot-key skew mitigation: salted joins and salted exact distincts.

AQE's runtime skew-join split handles most skew transparently (enabled
in session.py), but two cases still want EXPLICIT salting at 100 TB:

- a shuffle join whose hot key is known/structural (one domain holds
  half the corpus): `salted_join` replicates the small side n_salt×
  and scatters the big side's hot key across n_salt reducer partitions
  deterministically — no single reducer ever sees the whole hot key.
- `COUNT(DISTINCT v)` per key: the distinct shuffle carries every
  (key, value) pair to ONE reducer per key. `salted_count_distinct`
  salts by the VALUE hash, so each reducer deduplicates a disjoint
  value slice exactly (value v always lands in slice hash(v) mod n —
  duplicates collapse within their slice and never span two), and the
  per-slice exact counts SUM to the exact global distinct. Exactness
  without the hot-key funnel; the md5 salt is content-derived, so the
  result is partitioning- and retry-independent.

Both results are bit-equal to their unsalted forms (oracle-gated via
`skew_salted_distinct`, property-tested for the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from error_analysis_spark.extensions.text import md5_prefix_long


def salted_join(big: DataFrame, small: DataFrame, key_col: str,
                n_salt: int = 8, how: str = "inner",
                row_id_col: str | None = None) -> DataFrame:
    """Equi-join with the small side replicated n_salt× and the big
    side scattered by a content-derived salt. Output columns = both
    inputs' columns (the salt is internal). Supports inner/left joins
    (right/full would need salt-aware null handling).

    Limitation: the salt is derived from row CONTENT, so a hot key
    whose rows are exact byte-for-byte duplicates all hash to one salt
    and still funnel into a single reducer. When the big side carries
    a stable per-row discriminator (an ingest row id, file offset,
    uuid), pass it as `row_id_col` — it is folded into the salt input
    so even duplicate-content rows scatter, while the salt stays
    deterministic under retries and repartitioning (which a
    `rand()`/`monotonically_increasing_id()` salt would not)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    # content-derived (not random): identical under retries and
    # repartitioning; hot KEYS scatter because their many rows differ
    salt_cols = [F.col(c).cast("string") for c in big.columns]
    if row_id_col is not None:
        if row_id_col not in big.columns:
            raise ValueError(f"row_id_col {row_id_col!r} not in big side")
        # listed first so it dominates even when all content ties
        salt_cols = [F.col(row_id_col).cast("string")] + salt_cols
    salted = big.withColumn(
        "_salt",
        F.pmod(md5_prefix_long(F.concat_ws("\x1f", *salt_cols)),
               F.lit(n_salt)).cast("int"))
    out = salted.join(rep, [key_col, "_salt"], how)
    return out.drop("_salt")


def salted_count_distinct(df: DataFrame, key_col: str, value_col: str,
                          n_salt: int = 16) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) without a per-key reducer
    funnel: phase 1 deduplicates (key, value-slice) partitions — the
    shuffle key is (key, hash(value) mod n_salt), so a hot key's
    distinct set spreads over n_salt reducers — phase 2 sums the
    per-slice exact counts (disjoint slices ⇒ the sum is exact).

    Returns (key_col, n_distinct)."""
    salt = F.pmod(md5_prefix_long(F.col(value_col).cast("string")),
                  F.lit(n_salt)).cast("int")
    per_slice = (df.select(F.col(key_col), F.col(value_col)
                           .alias("_v"), salt.alias("_salt"))
                 .groupBy(key_col, "_salt")
                 .agg(F.countDistinct("_v").alias("_nd")))
    return (per_slice.groupBy(key_col)
            .agg(F.sum("_nd").alias("n_distinct")))
