"""Parquet table loaders for the driver's synthetic tables (TESTDATA.md).

The driver writes TIMESTAMP(NANOS) parquet, which Spark reads only via
`spark.sql.legacy.parquet.nanosAsLong=true` (set in session.py); the
loader converts those long-nanos columns back to proper timestamps so
all downstream date arithmetic (SC2/SC5/SC7) is type-correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# timestamp-typed columns per driver table
_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Session-scoped PLAN memo (round 11): every spark.read.parquet
    # call runs a 1-task schema-inference job against the file footer
    # (~0.1-0.4 s of pure fixed cost), and the engine's query registry
    # calls load_table hundreds of times per session on the same ten
    # static tables. Memoizing the LAZY DataFrame on the session object
    # is the catalog-registration a production deployment does once at
    # startup — the parquet scan itself still executes fresh on every
    # action (nothing about results or data is cached; kept per-session
    # so a foreign driver session never sees another session's plans).
    # Caveat: the memoized plan pins the file listing snapshot —
    # correct for the driver's immutable testdata tables; paths whose
    # contents mutate mid-session must not go through this loader.
    cache = getattr(spark, "_ea_table_plans", None)
    if cache is None:
        cache = {}
        spark._ea_table_plans = cache
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, NOT floor(double/1000): bigint epoch-nanos
            # exceed 2^53, so the double cast rounds by up to 128ns and
            # ~1.6%% of rows land one microsecond off the exact value
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    cache[key] = df
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (SQL-path entry)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
