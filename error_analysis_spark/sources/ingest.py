"""Driver-side ingest utilities — SURVEY §2.1 S1/S3 [IO-only].

The engine's tables are plain Parquet; converting archival formats
(GeoTIFF, LAS/LAZ) happens ONCE at the edge, driver-side, exactly as the
reference shells out to rasterio/PDAL. The codec paths are gated behind
import-tries (this container ships neither rasterio nor laspy); the
array→long-table conversion itself is pure numpy/pandas and fully
tested. `differencing_functions.py:69-79` (raster open) and `:739-828`
(LAS pipeline) are the reference counterparts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from error_analysis_spark.fixtures import GridSpec

PIXEL_COLUMNS = ["dataset_id", "band", "row", "col", "x", "y", "value"]


def array_to_pixels(spark: SparkSession, arr: np.ndarray, grid: GridSpec,
                    band: int = 1) -> DataFrame:
    """Dense 2-D array (+ GridSpec) → long pixel DataFrame. NaN and the
    grid's nodata sentinel both become SQL NULL (the engine's single
    nodata rule, SURVEY §7 hard part #6)."""
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {arr.shape}")
    if arr.shape != (grid.height, grid.width):
        raise ValueError(
            f"array shape {arr.shape} != grid (h,w) "
            f"({grid.height}, {grid.width})")
    rr, cc = np.mgrid[0:grid.height, 0:grid.width]
    vals = arr.astype(np.float64).ravel().copy()
    vals[~np.isfinite(vals)] = np.nan
    vals[vals == grid.nodata] = np.nan
    pdf = pd.DataFrame({
        "dataset_id": grid.dataset_id,
        "band": np.int32(band),
        "row": rr.ravel().astype(np.int32),
        "col": cc.ravel().astype(np.int32),
        "x": grid.x0 + (cc.ravel() + 0.5) * grid.res,
        "y": grid.y0 - (rr.ravel() + 0.5) * grid.res,
        "value": vals,
    })
    pdf.loc[pdf["value"].isna(), "value"] = None
    return spark.createDataFrame(pdf[PIXEL_COLUMNS])


def pixels_to_array(pixels_pdf: pd.DataFrame, grid: GridSpec) -> np.ndarray:
    """Inverse of `array_to_pixels` (collected pixel rows → dense array,
    NaN where absent/NULL) — the driver-side GeoTIFF-export step."""
    arr = np.full((grid.height, grid.width), np.nan)
    sub = pixels_pdf.dropna(subset=["value"])
    arr[sub["row"].to_numpy(int), sub["col"].to_numpy(int)] = \
        sub["value"].to_numpy(float)
    return arr


def geotiff_to_pixels(spark: SparkSession, path: str,
                      dataset_id: str) -> DataFrame:
    """GeoTIFF → pixel table. Requires rasterio (not in this container);
    the conversion after decode is `array_to_pixels`."""
    try:
        import rasterio  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "geotiff_to_pixels requires rasterio; install it on the "
            "ingest host (engine tables are plain parquet — see "
            "sources/pixel_store.py)") from e
    with rasterio.open(path) as src:  # pragma: no cover
        arr = src.read(1).astype(np.float64)
        t = src.transform
        grid = GridSpec(dataset_id, src.width, src.height, t.c, t.f, t.a,
                        str(src.crs), src.nodata if src.nodata is not None
                        else -9999.0)
    return array_to_pixels(spark, arr, grid)  # pragma: no cover


def las_to_points(spark: SparkSession, path: str) -> DataFrame:
    """LAS/LAZ → points table. Requires laspy (not in this container)."""
    try:
        import laspy  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "las_to_points requires laspy; install it on the ingest host "
            "(points tables are plain parquet)") from e
    las = laspy.read(path)  # pragma: no cover
    pdf = pd.DataFrame({  # pragma: no cover
        "x": np.asarray(las.x), "y": np.asarray(las.y),
        "z": np.asarray(las.z),
        "classification": np.asarray(las.classification, dtype=np.int32),
        "gps_time": np.asarray(las.gps_time, dtype=np.float64),
        "return_number": np.asarray(las.return_number, dtype=np.int32),
    })
    return spark.createDataFrame(pdf)  # pragma: no cover


# --------------------------------------------------------------------------
# JSONL documents source/sink (training-data interchange format)
# --------------------------------------------------------------------------

DOCUMENTS_SCHEMA = ("doc_id BIGINT, text STRING, lang STRING, "
                    "source STRING, n_chars BIGINT")


def write_documents_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                          compression: str | None = "gzip",
                          shards: int | None = None) -> None:
    """JSONL sink — the lingua franca of pretraining corpora. One file
    per partition; pass `shards` to repartition for a target shard
    count (a full shuffle — prefer leaving it None and letting the
    upstream partitioning carry through). gzip by default: JSONL
    shards are read once and archived, so size wins over codec speed."""
    w = df if shards is None else df.repartition(shards)
    writer = w.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: str = DOCUMENTS_SCHEMA,
                         keep_corrupt: bool = False) -> DataFrame:
    """Schema-pinned JSONL scan. The explicit schema is the scale
    contract: without it Spark runs a full inference pre-pass over the
    corpus (an extra 100 TB read) and any malformed shard can flip
    column types mid-pipeline. PERMISSIVE mode nulls malformed rows;
    `keep_corrupt` adds a `_corrupt_record` column so the cleaning
    stage can quarantine them instead of silently dropping."""
    s = schema + (", _corrupt_record STRING" if keep_corrupt else "")
    return (spark.read.schema(s)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(path))


def read_documents_csv(spark: SparkSession, path: str,
                       schema: str = DOCUMENTS_SCHEMA,
                       keep_corrupt: bool = False,
                       sep: str = ",", header: bool = True) -> DataFrame:
    """Schema-pinned CSV scan with the same quarantine contract as the
    JSONL reader: an explicit schema (no inference pre-pass over the
    corpus), PERMISSIVE mode, and an optional `_corrupt_record`
    column for the cleaning stage. multiLine stays OFF — quoted
    embedded newlines make shards non-splittable, which at 100 TB
    serializes the scan; corpora with newlines in text belong in
    JSONL/parquet instead."""
    s = schema + (", _corrupt_record STRING" if keep_corrupt else "")
    return (spark.read.schema(s)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .option("header", str(header).lower())
            .option("sep", sep)
            .option("multiLine", "false")
            .csv(path))


def write_compacted(df: DataFrame, path: str,
                    target_rows_per_file: int,
                    mode: str = "overwrite") -> None:
    """Small-files compaction sink: bin-pack the output into parquet
    files of ~`target_rows_per_file` rows.

    The row-count route (`maxRecordsPerFile` + a repartition sized
    from the count) beats leaving 10k tiny micro-batch files on disk —
    the classic small-files problem that makes every downstream 100 TB
    scan pay per-file open/footer costs. `df` is persisted across the
    count and the write: without the pin, a COMPUTED input (join/agg
    output — the typical compaction candidate) would execute its whole
    plan twice; for a plain file scan the count is footer-cheap either
    way and the cache costs one pass-through. `maxRecordsPerFile` caps
    stragglers when partitions skew. (On a real cluster pair this with
    AQE coalesce so the shuffle that produces `df` already lands near
    the target.)"""
    df = df.persist()
    try:
        n = df.count()
        n_files = max(1, (n + target_rows_per_file - 1)
                      // target_rows_per_file)
        (df.repartition(n_files)
         .write.mode(mode)
         .option("maxRecordsPerFile", target_rows_per_file)
         .parquet(path))
    finally:
        df.unpersist()


# --------------------------------------------------------------------------
# ORC documents source/sink (round 10 — the columnar interchange
# sibling of parquet; Hive-ecosystem corpora arrive in it)
# --------------------------------------------------------------------------

def write_documents_orc(df: DataFrame, path: str, mode: str = "overwrite",
                        compression: str = "zstd") -> None:
    """ORC sink. Same scale posture as the parquet tables: columnar,
    splittable stripes, min/max stripe statistics that serve predicate
    pushdown exactly like parquet row groups. zstd by default (ORC's
    zlib default trades too much CPU at read time)."""
    df.write.mode(mode).option("compression", compression).orc(path)


def read_documents_orc(spark: SparkSession, path: str,
                       schema: str = DOCUMENTS_SCHEMA) -> DataFrame:
    """Schema-pinned ORC scan — the explicit schema skips footer-based
    inference pre-passes on wide corpora and pins column types across
    heterogeneous shard generations. Filters and column pruning push
    into the ORC reader the same way they do for parquet
    (PushedFilters / ReadSchema in the scan node)."""
    return spark.read.schema(schema).orc(path)
