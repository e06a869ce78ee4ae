"""Zone delineation and membership — SURVEY.md §2 J2 (point-in-polygon
semi-join), R8 (rasterize), SO2 (stable = valid − unstable), A13 (counts).

Reference semantics: stable_unstable_areas.py:598-638 (rasterize zones
into masks), 351-410 (derive_stable_from_unstable), 445-454 (pixel
counting), 641-671 (stats_all/stats_each).

Spark-first design: zones are a tiny broadcast table of WKT polygons;
membership is a broadcast nested-loop join with a vectorized
ray-casting pandas UDF on the pixel coordinates — the huge side never
shuffles. Materializing the result (R8) gives the `zone_membership`
table every downstream zonal aggregate joins against on (row, col).
Bounding-box pre-filter keeps the UDF off pixels that cannot match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from error_analysis_spark.functions.geometry import point_in_wkt, polygon_bounds


def membership(pixels: DataFrame, zones: DataFrame,
               kinds: list[str] | None = None) -> DataFrame:
    """J2/R8 — (pixel × zone) membership via broadcast PIP join.

    `zones`: zone_id, kind, name, wkt. Adds a WKT bbox pre-filter as join
    condition so the cross join is range-pruned before the UDF runs
    (Catalyst evaluates the cheap bbox predicate first; the pandas UDF
    sees only candidate rows).
    """
    if kinds is not None:
        zones = zones.where(F.col("kind").isin(kinds))
    zrows = zones.select("zone_id", "kind", "wkt").collect()
    sess = pixels.sparkSession
    bounds = [
        (r["zone_id"], r["kind"], r["wkt"], *polygon_bounds(r["wkt"]))
        for r in zrows
    ]
    zdf = sess.createDataFrame(
        bounds, ["zone_id", "kind", "wkt", "minx", "miny", "maxx", "maxy"])
    cand = pixels.join(
        F.broadcast(zdf),
        (F.col("x") >= F.col("minx")) & (F.col("x") <= F.col("maxx"))
        & (F.col("y") >= F.col("miny")) & (F.col("y") <= F.col("maxy")),
    )
    return (
        cand.where(point_in_wkt(F.col("x"), F.col("y"), F.col("wkt")))
        .drop("wkt", "minx", "miny", "maxx", "maxy")
    )


def derive_stable(valid_pixels: DataFrame, zones: DataFrame) -> DataFrame:
    """SO2 — stable area = valid pixels minus the union of unstable
    (feature-of-interest) polygons: anti-join on the membership keys
    (derive_stable_from_unstable, stable_unstable_areas.py:351-410).
    Output: the stable subset of `valid_pixels` tagged zone_id='stable'.
    """
    foi = membership(valid_pixels.select("row", "col", "x", "y"),
                     zones, kinds=["unstable"]).select("row", "col")
    return (
        valid_pixels.join(foi, ["row", "col"], "left_anti")
        .withColumn("zone_id", F.lit("stable"))
    )


def zone_pixel_counts(member: DataFrame) -> DataFrame:
    """A13 — valid-pixel count per zone (stable_unstable_areas.py:445-454)."""
    return (member.where(F.col("value").isNotNull())
            .groupBy("zone_id").agg(F.count("*").alias("n_pixels")))
