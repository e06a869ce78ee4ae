"""Pixel-table storage layout for cluster scale — SURVEY §1.4, §2.1 S1/S2.

A raster at 100 TB is billions of (row, col, value) rows. Two layout
decisions make every downstream operator cheap:

1. **Tile partitioning** (`ty = row ÷ tile`, `tx = col ÷ tile`): mirrors
   the reference's 256×256 GeoTIFF tiling (differencing_functions.py:704).
   Spatial predicates (zone bboxes, crop windows) become partition
   pruning — Catalyst never opens non-matching tile directories.

2. **Bucketing on (row, col)**: `bucketBy(n, 'row', 'col')` writes both
   rasters of a pair pre-shuffled on the join key. The J1 pair join (and
   every (row, col) equi-join after it: membership, σ²-lookup, masks)
   then plans as a zipped SortMergeJoin with NO Exchange on either side
   — at 1000 executors the align step reads co-located buckets instead
   of reshuffling ~terabytes.

GeoTIFF/LAS ingest stays a thin driver-side utility by design (SURVEY §7
[IO-only]); this module owns the Parquet layout only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE = 256


def with_tiles(pixels: DataFrame, tile: int = TILE) -> DataFrame:
    """Add partition columns ty/tx (tile row/col). FLOOR division, not
    int-cast truncation: a negative row/col must land on tile -1, the
    same floor semantics `prune_to_bbox`'s `//` bounds use — truncation
    put row=-5 on tile 0 and the bbox prune then silently dropped it
    (`write_points` already floors for the point path)."""
    return (pixels
            .withColumn("ty", F.floor(F.col("row") / tile).cast("int"))
            .withColumn("tx", F.floor(F.col("col") / tile).cast("int")))


def write_pixels(pixels: DataFrame, path: str, tile: int = TILE) -> None:
    """S2 — plain partitioned layout (no metastore needed): one directory
    per (dataset_id, ty, tx); 256² float tiles ≈ the reference's GeoTIFF
    block size."""
    (with_tiles(pixels, tile)
     .repartition("dataset_id", "ty", "tx")
     .write.mode("overwrite")
     .partitionBy("dataset_id", "ty", "tx")
     .parquet(path))


def read_pixels(spark: SparkSession, path: str,
                dataset_id: str | None = None) -> DataFrame:
    """S1 — partition-pruned scan: a dataset_id/tile predicate prunes at
    the directory level before any IO."""
    df = spark.read.parquet(path)
    if dataset_id is not None:
        df = df.where(F.col("dataset_id") == dataset_id)
    return df


def save_bucketed(pixels: DataFrame, table: str, n_buckets: int = 64,
                  tile: int = TILE) -> None:
    """Persist a pixel table bucketed + sorted on (row, col).

    Two tables written this way join on (row, col) with zero Exchange:
    the physical plan is SortMergeJoin over matching buckets (verified in
    tests/test_pixel_store.py by asserting no Exchange below the join).
    Use one bucket count for every raster of a working set — bucket
    alignment is what removes the shuffle.
    """
    (with_tiles(pixels, tile)
     .write.mode("overwrite")
     .bucketBy(n_buckets, "row", "col")
     .sortBy("row", "col")
     .saveAsTable(table))  # managed table under spark.sql.warehouse.dir


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def prune_to_bbox(pixels: DataFrame, min_row: int, max_row: int,
                  min_col: int, max_col: int, tile: int = TILE) -> DataFrame:
    """Push a spatial window down to tile partitions AND row/col stats:
    the ty/tx predicates prune directories, the row/col predicates prune
    row groups via parquet min/max."""
    return pixels.where(
        (F.col("ty") >= min_row // tile) & (F.col("ty") <= max_row // tile)
        & (F.col("tx") >= min_col // tile) & (F.col("tx") <= max_col // tile)
        & (F.col("row") >= min_row) & (F.col("row") <= max_row)
        & (F.col("col") >= min_col) & (F.col("col") <= max_col)
    )


def write_points(points: DataFrame, path: str,
                 tile_size: float = 1024.0) -> None:
    """S7 — point-cloud sink (PDAL writers.las analog,
    differencing_functions.py:708-735). The engine's archival format is
    Parquet, laid out in spatial tiles of `tile_size` map units so a
    later crop (F4) or EPT-style windowed read (S4) prunes directories
    instead of scanning the cloud. LAS/LAZ export, when needed, is the
    same driver-side codec shim as ingest (sources/ingest.py)."""
    (points
     .withColumn("px", F.floor(F.col("x") / tile_size).cast("int"))
     .withColumn("py", F.floor(F.col("y") / tile_size).cast("int"))
     .repartition("px", "py")
     .write.mode("overwrite")
     .partitionBy("px", "py")
     .parquet(path))


def read_points(spark: SparkSession, path: str,
                bbox: tuple[float, float, float, float] | None = None,
                tile_size: float = 1024.0) -> DataFrame:
    """S3/S4 — point scan with optional bbox pushdown: tile predicates
    prune partition directories, x/y predicates prune row groups."""
    df = spark.read.parquet(path)
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        df = df.where(
            (F.col("px") >= int(minx // tile_size))
            & (F.col("px") <= int(maxx // tile_size))
            & (F.col("py") >= int(miny // tile_size))
            & (F.col("py") <= int(maxy // tile_size))
            & (F.col("x") >= minx) & (F.col("x") <= maxx)
            & (F.col("y") >= miny) & (F.col("y") <= maxy))
    return df


def write_catalog_json(catalog: DataFrame, path: str) -> None:
    """S9 — JSON sink for catalog/metadata rows (the reference saves the
    raw OT response, differencing_functions.py:459-460; the engine
    persists the parsed rows as JSON lines, one file per partition —
    `coalesce(1)` upstream if a single file is required)."""
    catalog.write.mode("overwrite").json(path)
