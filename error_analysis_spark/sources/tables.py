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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`, NOT floor(double/1000): bigint epoch-nanos
            # exceed 2^53, so the double cast rounds by up to 128ns and
            # ~1.6%% of rows land one microsecond off the exact value
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (SQL-path entry)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
