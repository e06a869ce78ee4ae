"""Driver-contract queries: raster/grid operators (SURVEY §2.8, §2.1 S8).

The driver's tables have no grid, so events are mapped onto deterministic
grids/point sets (pure integer arithmetic on event_id → identical on both
engines). Each query drives the REAL engine operator (focal stencil join,
gridding aggregate, gap-fill range-join); the oracle re-states the
semantics in portable SQL.

Bit-stability notes:
- roughness (max of |Δz|) involves no transcendentals → exact equality;
- IDW sums are floats → rounded to 3 dp on both sides (weights hit the
  same binary-exact coordinates, so only sum ORDER differs: last-ulp);
- counts/keys stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.fixtures import GridSpec
from error_analysis_spark.operators import focal as FO
from error_analysis_spark.operators import pointcloud as PC
from error_analysis_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# shared deterministic mappings (event_id → grid / points)
# --------------------------------------------------------------------------

def _event_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100×100 grid: row = id % 100, col = id // 100; ~2.7% nodata holes
    (id % 37 = 0) to exercise the incomplete-stencil path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        (F.col("event_id") % 100).cast("int").alias("row"),
        (F.col("event_id") / 100).cast("int").alias("col"),
        F.when(F.col("event_id") % 37 != 0,
               F.round(F.col("value"), 3)).alias("value"),
    ).where(F.col("value").isNotNull())


_EVENT_PX_SQL = """
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col,
         round(value, 3) AS value
  FROM events WHERE event_id % 37 <> 0 AND value IS NOT NULL
"""


def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic point cloud: binary-exact fractional coordinates so
    point→cell-center distances are identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        (F.col("event_id") % 313).cast("double") * 0.75,
        (F.col("event_id") / 313).cast("int").cast("double") * 0.5,
        F.round(F.col("value"), 3).alias("z"),
    ).toDF("x", "y", "z")


_EVENT_PT_SQL = """
  SELECT CAST(event_id % 313 AS DOUBLE) * 0.75 AS x,
         CAST(event_id // 313 AS DOUBLE) * 0.5 AS y,
         round(value, 3) AS z
  FROM events
"""

_PT_GRID = GridSpec("pts", width=48, height=48, x0=0.0, y0=16.0, res=5.0)


# --------------------------------------------------------------------------
# R2 — focal derivatives (slope/aspect/hillshade/roughness) via the
# 8-offset stencil join; ONE gather shuffle feeds all four (the four
# per-derivative queries of rounds 1-2 were consolidated so the whole
# family stays inside the driver's verification window — see COVERAGE.md)
# --------------------------------------------------------------------------

import math as _math

_AZ = _math.radians(360.0 - 315.0 + 90.0)
_ALT = _math.radians(45.0)


def r2_focal_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four R2 derivatives from one stencil gather (Horn slope,
    GDAL aspect zeroForFlat, GDAL hillshade az 315 / alt 45, roughness
    = window max − min). Rounded to 3 dp (atan/sqrt are IEEE-identical
    across engines; rounding guards the last ulp)."""
    px = _event_pixels(spark, sf_dir)
    out = FO.derive_join_all(px, res=2.0)
    return (out.where(F.col("roughness").isNotNull())
            .select("row", "col",
                    F.round("slope", 3).alias("slope_deg"),
                    F.round("aspect", 3).alias("aspect_deg"),
                    F.round("hillshade", 3).alias("shade"),
                    F.round("roughness", 3).alias("rough")))


R2ALL_SQL = f"""
WITH px AS ({_EVENT_PX_SQL}),
nb AS (
  SELECT a.row, a.col,
         count(*) AS n_win,
         max(b.value) - min(b.value) AS rough,
         sum(CASE WHEN b.row = a.row - 1 AND b.col = a.col - 1 THEN b.value END) AS z_a,
         sum(CASE WHEN b.row = a.row - 1 AND b.col = a.col     THEN b.value END) AS z_b,
         sum(CASE WHEN b.row = a.row - 1 AND b.col = a.col + 1 THEN b.value END) AS z_c,
         sum(CASE WHEN b.row = a.row     AND b.col = a.col - 1 THEN b.value END) AS z_d,
         sum(CASE WHEN b.row = a.row     AND b.col = a.col + 1 THEN b.value END) AS z_f,
         sum(CASE WHEN b.row = a.row + 1 AND b.col = a.col - 1 THEN b.value END) AS z_g,
         sum(CASE WHEN b.row = a.row + 1 AND b.col = a.col     THEN b.value END) AS z_h,
         sum(CASE WHEN b.row = a.row + 1 AND b.col = a.col + 1 THEN b.value END) AS z_i
  FROM px a JOIN px b
    ON b.row BETWEEN a.row - 1 AND a.row + 1
   AND b.col BETWEEN a.col - 1 AND a.col + 1
  GROUP BY a.row, a.col
),
grad AS (
  SELECT row, col, n_win, rough,
         ((z_c + 2 * z_f + z_i) - (z_a + 2 * z_d + z_g)) / 16.0 AS dzdx,
         ((z_g + 2 * z_h + z_i) - (z_a + 2 * z_b + z_c)) / 16.0 AS dzdy
  FROM nb
),
d AS (
  SELECT row, col, n_win, rough, dzdx, dzdy,
         atan(sqrt(dzdx * dzdx + dzdy * dzdy)) AS slope_rad,
         degrees(atan2(dzdy, -dzdx)) AS a0
  FROM grad
)
SELECT row, col,
       round(degrees(slope_rad), 3) AS slope_deg,
       round(CASE WHEN dzdx = 0 AND dzdy = 0 THEN 0.0
                  WHEN a0 < 0 THEN 90.0 - a0
                  WHEN a0 > 90.0 THEN 360.0 - a0 + 90.0
                  ELSE 90.0 - a0 END, 3) AS aspect_deg,
       round(least(greatest(
         {_math.sin(_ALT)!r} * cos(slope_rad)
       + {_math.cos(_ALT)!r} * sin(slope_rad)
         * cos({_AZ!r} - atan2(dzdy, -dzdx)), 0.0), 1.0) * 254.0 + 1.0,
         3) AS shade,
       round(rough, 3) AS rough
FROM d WHERE n_win = 9
"""


# --------------------------------------------------------------------------
# S8 — point gridding: max (DSM) and IDW (DTM)
# --------------------------------------------------------------------------

def s8_grid_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points(spark, sf_dir)
    return (PC.grid_max(pts, _PT_GRID)
            .select("row", "col", F.col("value").alias("z_max")))


S8MAX_SQL = f"""
WITH pts AS ({_EVENT_PT_SQL}),
cells AS (
  SELECT CAST(floor(({_PT_GRID.y0} - y) / {_PT_GRID.res}) AS INTEGER) AS row,
         CAST(floor((x - {_PT_GRID.x0}) / {_PT_GRID.res}) AS INTEGER) AS col,
         z
  FROM pts
)
SELECT row, col, max(z) AS z_max
FROM cells
WHERE row >= 0 AND row < {_PT_GRID.height}
  AND col >= 0 AND col < {_PT_GRID.width}
GROUP BY row, col
"""


def s8_grid_idw(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points(spark, sf_dir)
    return (PC.grid_idw(pts, _PT_GRID)
            .select("row", "col", F.round("value", 3).alias("z_idw")))


S8IDW_SQL = f"""
WITH pts AS ({_EVENT_PT_SQL}),
-- every point fans out to its 5x5 cell window (a cell's center can be
-- within radius 2·res only of points at most 2 cells away) — the same
-- enumeration the engine's fan-out join performs
pairs AS (
  SELECT CAST(floor(({_PT_GRID.y0} - p.y) / {_PT_GRID.res}) AS INTEGER)
           + dy.dy AS row,
         CAST(floor((p.x - {_PT_GRID.x0}) / {_PT_GRID.res}) AS INTEGER)
           + dx.dx AS col,
         p.z, p.x, p.y
  FROM pts p
  CROSS JOIN (VALUES (-2), (-1), (0), (1), (2)) dy(dy)
  CROSS JOIN (VALUES (-2), (-1), (0), (1), (2)) dx(dx)
),
dists AS (
  SELECT row, col, z,
         sqrt(power(x - ({_PT_GRID.x0} + (col + 0.5) * {_PT_GRID.res}), 2)
            + power(y - ({_PT_GRID.y0} - (row + 0.5) * {_PT_GRID.res}), 2))
         AS d
  FROM pairs
  WHERE row >= 0 AND row < {_PT_GRID.height}
    AND col >= 0 AND col < {_PT_GRID.width}
),
idw AS (
  SELECT row, col,
         max(CASE WHEN d < {_PT_GRID.res} * 1e-9 THEN z END) AS z_exact,
         sum(CASE WHEN d >= {_PT_GRID.res} * 1e-9 THEN z / (d * d) END)
           / sum(CASE WHEN d >= {_PT_GRID.res} * 1e-9 THEN 1.0 / (d * d) END)
           AS z_w
  FROM dists
  WHERE d <= 2.0 * {_PT_GRID.res}
  GROUP BY row, col
)
SELECT row, col, round(coalesce(z_exact, z_w), 3) AS z_idw
FROM idw
"""


# --------------------------------------------------------------------------
# R3 — gap-fill: missing cells take IDW of donors within max_dist
# --------------------------------------------------------------------------

_FILL_DIST = 5.0


def _holed_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 100×100 grid with holes at id % 37 = 0 — shared input for
    every R3 fill variant."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        (F.col("event_id") % 100).cast("int").alias("row"),
        (F.col("event_id") / 100).cast("int").alias("col"),
        F.when(F.col("event_id") % 37 != 0,
               F.round(F.col("value"), 3)).alias("value"),
    )


_R3_GRID = GridSpec("g", width=100, height=100, x0=0.0, y0=100.0, res=1.0)


def r3_fill_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four SQL-expressible R3 fill variants over the same holed
    grid, one output row per filled cell (NULL where a method's donor
    criterion leaves the hole unfilled): idw (bucketed donor
    range-join), nearest (min_by donor pick over a deterministic
    integer order key), linear + cubic (directional grid-line window
    interpolation). Consolidated from four per-method queries so the
    whole family stays inside the driver's verification window."""
    px = _holed_grid(spark, sf_dir)
    out = PC.fill_nodata_multi(px, _R3_GRID, max_dist=_FILL_DIST)
    return out.select(
        "row", "col",
        F.round("z_fill", 3).alias("z_fill"),
        F.round("z_near", 3).alias("z_near"),
        F.round("z_lin", 3).alias("z_lin"),
        F.round("z_cub", 3).alias("z_cub"))


R3_SQL = f"""
WITH px AS (
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col,
         CASE WHEN event_id % 37 <> 0 THEN round(value, 3) END AS value
  FROM events
),
valid AS (SELECT * FROM px WHERE value IS NOT NULL),
missing AS (SELECT row, col FROM px WHERE value IS NULL),
fill AS (
  SELECT m.row, m.col,
         sum(v.value / (power(m.row - v.row, 2) + power(m.col - v.col, 2)))
           / sum(1.0 / (power(m.row - v.row, 2) + power(m.col - v.col, 2)))
           AS value
  FROM missing m JOIN valid v
    ON v.row BETWEEN m.row - {int(_FILL_DIST)} AND m.row + {int(_FILL_DIST)}
   AND v.col BETWEEN m.col - {int(_FILL_DIST)} AND m.col + {int(_FILL_DIST)}
  WHERE power(m.row - v.row, 2) + power(m.col - v.col, 2)
          <= {_FILL_DIST} * {_FILL_DIST}
  GROUP BY m.row, m.col
)
SELECT row, col, round(value, 3) AS z_fill FROM fill
"""


R3NEAR_SQL = f"""
WITH px AS (
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col,
         CASE WHEN event_id % 37 <> 0 THEN round(value, 3) END AS value
  FROM events
),
valid AS (SELECT * FROM px WHERE value IS NOT NULL),
missing AS (SELECT row, col FROM px WHERE value IS NULL),
cand AS (
  SELECT m.row, m.col, v.value,
         (power(m.row - v.row, 2) + power(m.col - v.col, 2)) * 1048576
           + v.row * 1024 + v.col AS okey,
         power(m.row - v.row, 2) + power(m.col - v.col, 2) AS d2
  FROM missing m JOIN valid v
    ON v.row BETWEEN m.row - {int(_FILL_DIST)} AND m.row + {int(_FILL_DIST)}
   AND v.col BETWEEN m.col - {int(_FILL_DIST)} AND m.col + {int(_FILL_DIST)}
)
SELECT row, col, round(arg_min(value, okey), 3) AS z_near
FROM cand WHERE d2 <= {_FILL_DIST} * {_FILL_DIST}
GROUP BY row, col
"""


def _dir_fill_sql(part: str, ordc: str, est: str, cubic: bool) -> str:
    """One direction of the linear/cubic fill oracle, mirroring
    `pointcloud._axis_estimate` term-for-term (same association order,
    so doubles agree to the ulp)."""
    md = float(_FILL_DIST)
    lin = ("(l).val + ((r).val - (l).val) * (c - (l).pos) "
           "/ ((r).pos - (l).pos)")
    inner = (f"l IS NOT NULL AND r IS NOT NULL AND c - (l).pos <= {md!r} "
             f"AND (r).pos - c <= {md!r}")
    if not cubic:
        case = f"CASE WHEN {inner} THEN {lin} END"
    else:
        xs = ["(l).o_pos", "(l).pos", "(r).pos", "(r).i_pos"]
        ys = ["(l).o_val", "(l).val", "(r).val", "(r).i_val"]
        terms = []
        for i in range(4):
            num = " * ".join(f"(c - {xs[j]})" for j in range(4) if j != i)
            den = " * ".join(f"({xs[i]} - {xs[j]})" for j in range(4)
                             if j != i)
            terms.append(f"{ys[i]} * ({num}) / ({den})")
        lagr = " + ".join(terms)
        case = (f"CASE WHEN {inner} AND (l).o_pos IS NOT NULL "
                f"AND (r).i_pos IS NOT NULL THEN {lagr} "
                f"WHEN {inner} THEN {lin} END")
    return f"""
v_{est} AS (
  SELECT row, col, value,
         CAST(lag({ordc})  OVER w AS DOUBLE) AS o_pos,
         lag(value)  OVER w AS o_val,
         CAST(lead({ordc}) OVER w AS DOUBLE) AS i_pos,
         lead(value) OVER w AS i_val
  FROM px WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY {part} ORDER BY {ordc})
),
u_{est} AS (
  SELECT p.row, p.col, p.value,
         CASE WHEN p.value IS NOT NULL THEN struct_pack(
           pos := CAST(p.{ordc} AS DOUBLE), val := p.value,
           o_pos := v.o_pos, o_val := v.o_val,
           i_pos := v.i_pos, i_val := v.i_val) END AS d
  FROM px p LEFT JOIN v_{est} v ON p.row = v.row AND p.col = v.col
),
s_{est} AS (
  SELECT row, col, value, CAST({ordc} AS DOUBLE) AS c,
         last_value(d IGNORE NULLS) OVER
           (PARTITION BY {part} ORDER BY {ordc}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS l,
         first_value(d IGNORE NULLS) OVER
           (PARTITION BY {part} ORDER BY {ordc}
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS r
  FROM u_{est}
),
e_{est} AS (
  SELECT row, col, {case} AS {est}
  FROM s_{est} WHERE value IS NULL
)"""


def _fill_dir_sql(alias: str, cubic: bool) -> str:
    return f"""
WITH px AS (
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col,
         CASE WHEN event_id % 37 <> 0 THEN round(value, 3) END AS value
  FROM events
),{_dir_fill_sql('row', 'col', 'est_h', cubic)},{_dir_fill_sql('col', 'row', 'est_v', cubic)}
SELECT row, col, round(avg(est), 3) AS {alias}
FROM (SELECT row, col, est_h AS est FROM e_est_h
      UNION ALL SELECT row, col, est_v FROM e_est_v)
GROUP BY row, col
HAVING avg(est) IS NOT NULL
"""


R3LIN_SQL = _fill_dir_sql("z_lin", cubic=False)
R3CUB_SQL = _fill_dir_sql("z_cub", cubic=True)

# Combined oracle: the four per-method oracles (each a standalone WITH
# statement) composed as tagged subqueries, grouped per cell — same
# shape as the Spark-side unionByName + groupBy-max.
R3ALL_SQL = f"""
SELECT row, col,
       max(z_fill) AS z_fill, max(z_near) AS z_near,
       max(z_lin) AS z_lin, max(z_cub) AS z_cub
FROM (
  SELECT row, col, z_fill,
         CAST(NULL AS DOUBLE) AS z_near,
         CAST(NULL AS DOUBLE) AS z_lin,
         CAST(NULL AS DOUBLE) AS z_cub
  FROM ({R3_SQL})
  UNION ALL
  SELECT row, col, NULL, z_near, NULL, NULL FROM ({R3NEAR_SQL})
  UNION ALL
  SELECT row, col, NULL, NULL, z_lin, NULL FROM ({R3LIN_SQL})
  UNION ALL
  SELECT row, col, NULL, NULL, NULL, z_cub FROM ({R3CUB_SQL})
)
GROUP BY row, col
"""


# --------------------------------------------------------------------------
# R7 — polygonize: connected regions of a sparse valid mask (~30% fill,
# md5-seeded so both engines build the identical mask; subcritical
# density keeps regions small, which also bounds the oracle's
# recursive-CTE closure to ~|runs|·avg-region-size rows)
# --------------------------------------------------------------------------

def r7_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from error_analysis_spark.operators import zones as ZN
    ev = load_table(spark, sf_dir, "events")
    px = (ev.where(F.col("event_id") < 10000)
          .where(F.expr("conv(substr(md5(cast(event_id as string)), 1, 4),"
                        " 16, 10) % 10 < 3"))
          .select((F.col("event_id") % 100).cast("int").alias("row"),
                  (F.col("event_id") / 100).cast("int").alias("col")))
    return ZN.polygonize(px).select(
        "region_id", "n_px", "min_row", "max_row", "min_col", "max_col",
        "wkt")


R7_SQL = """
WITH px AS (
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col
  FROM events
  WHERE event_id < 10000
    AND ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
        % 10 < 3
),
cells AS (
  SELECT row, col,
         CASE WHEN col - lag(col) OVER w = 1 THEN 0 ELSE 1 END AS gap
  FROM px WINDOW w AS (PARTITION BY row ORDER BY col)
),
seqd AS (
  SELECT row, col, sum(gap) OVER (PARTITION BY row ORDER BY col
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
  FROM cells
),
runs AS (
  SELECT row, min(col) AS start_col, max(col) AS end_col,
         count(*) AS n_px,
         CAST(row AS BIGINT) * 4294967296 + min(col) AS run_id
  FROM seqd GROUP BY row, seq
),
e0 AS (
  SELECT a.run_id AS ra, b.run_id AS rb
  FROM runs a JOIN runs b ON a.row + 1 = b.row
   AND a.start_col <= b.end_col AND b.start_col <= a.end_col
),
edges AS (SELECT ra, rb FROM e0 UNION SELECT rb, ra FROM e0),
reach AS (
  WITH RECURSIVE r(src, node) AS (
    SELECT run_id, run_id FROM runs
    UNION
    SELECT r.src, e.rb FROM r JOIN edges e ON r.node = e.ra
  ) SELECT src, node FROM r
),
comp AS (SELECT src AS run_id, min(node) AS component FROM reach
         GROUP BY src)
SELECT c.component AS region_id,
       CAST(sum(r.n_px) AS BIGINT) AS n_px,
       min(r.row) AS min_row, max(r.row) AS max_row,
       min(r.start_col) AS min_col, max(r.end_col) AS max_col,
       printf('POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))',
              min(r.start_col), min(r.row),
              max(r.end_col) + 1, min(r.row),
              max(r.end_col) + 1, max(r.row) + 1,
              min(r.start_col), max(r.row) + 1,
              min(r.start_col), min(r.row)) AS wkt
FROM runs r JOIN comp c USING (run_id)
GROUP BY c.component
"""


# --------------------------------------------------------------------------
# J1+R4 — the flagship chain: align (regrid + pair join) → difference →
# median-bias subtract → zonal stats, in ONE lazy DAG.
# Reference semantics: RasterPairProcessor.process
# (differencing_functions.py:2056-2116), difference_da (:2473-2496),
# bias median + subtract (variography_uncertainty.py:116-136, notebook
# cells [60]-[74]).
#
# Raster A: 100×100 @ res 1 (x0=0, y0=100), holes at id % 41 = 0.
# Raster B: 50×50 @ res 2 with OFFSET origin (x0=0.25, y0=100.125) so
# each dest cell's 2×2 source candidates have pairwise-distinct center
# distances (dx ∈ {0.25, 0.75}, dy ∈ {0.375, 0.625}) — nearest-neighbor
# regrid is tie-free, hence engine min_by ≡ oracle arg_min exactly.
# A (10 000 cells) > B (2 500 cells) ⇒ align_pair regrids A onto B.
# --------------------------------------------------------------------------

_DOD_GRID_A = GridSpec("dem_a", width=100, height=100, x0=0.0, y0=100.0,
                       res=1.0)
_DOD_GRID_B = GridSpec("dem_b", width=50, height=50, x0=0.25, y0=100.125,
                       res=2.0)

def _dod_raster_pair(spark: SparkSession, sf_dir: str):
    """The shared j1_r4_dod / pipeline_chain raster-pair fixture
    (see the grid notes above): returns (a, b) on _DOD_GRID_A/B."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_id") < 10000).select(
        (F.col("event_id") % 100).cast("int").alias("row"),
        (F.col("event_id") / 100).cast("int").alias("col"),
        F.when(F.col("event_id") % 41 != 0,
               F.round(F.col("value"), 3)).alias("value"),
    ).withColumn("x", F.col("col") + 0.5) \
     .withColumn("y", F.lit(100.0) - (F.col("row") + 0.5))
    b = ev.where(F.col("event_id") < 2500).select(
        (F.col("event_id") % 50).cast("int").alias("row"),
        (F.col("event_id") / 50).cast("int").alias("col"),
        F.when(F.col("event_id") % 53 != 0,
               F.round(F.col("value") * 1.5, 3)).alias("value"),
    ).withColumn("x", F.lit(0.25) + (F.col("col") + 0.5) * 2.0) \
     .withColumn("y", F.lit(100.125) - (F.col("row") + 0.5) * 2.0)
    return a, b

# the regrid CTE prefix both oracles share (A nearest-neighbor-regridded
# onto B's offset grid, tie-free arg_min — see grid notes above)
_DOD_REGRID_CTES = """pa AS (
  SELECT CAST(event_id % 100 AS INTEGER) AS row,
         CAST(event_id // 100 AS INTEGER) AS col,
         round(value, 3) AS value
  FROM events
  WHERE event_id < 10000 AND event_id % 41 <> 0 AND value IS NOT NULL
),
pb AS (
  SELECT CAST(event_id % 50 AS INTEGER) AS row,
         CAST(event_id // 50 AS INTEGER) AS col,
         round(value * 1.5, 3) AS value
  FROM events
  WHERE event_id < 2500 AND event_id % 53 <> 0 AND value IS NOT NULL
),
cand AS (
  SELECT CAST(floor((100.125 - (100.0 - (row + 0.5))) / 2.0) AS INTEGER)
           AS t_row,
         CAST(floor(((col + 0.5) - 0.25) / 2.0) AS INTEGER) AS t_col,
         value,
         power((col + 0.5) - (0.25 + (CAST(floor(((col + 0.5) - 0.25) / 2.0)
                   AS INTEGER) + 0.5) * 2.0), 2)
       + power((100.0 - (row + 0.5)) - (100.125
               - (CAST(floor((100.125 - (100.0 - (row + 0.5))) / 2.0)
                   AS INTEGER) + 0.5) * 2.0), 2) AS d2
  FROM pa
),
a_on_b AS (
  SELECT t_row AS row, t_col AS col, arg_min(value, d2) AS value_a
  FROM cand
  WHERE t_row >= 0 AND t_row < 50 AND t_col >= 0 AND t_col < 50
  GROUP BY t_row, t_col
)"""




def j1_r4_dod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from error_analysis_spark.operators import align as AL
    a, b = _dod_raster_pair(spark, sf_dir)
    dod = AL.difference(AL.align_pair(a, b, _DOD_GRID_A, _DOD_GRID_B))
    zone = ((F.col("row") * 7 + F.col("col")) % 5).alias("zone_id")
    bias = (dod.where(((F.col("row") * 7 + F.col("col")) % 5) == 0)
            .agg(F.expr("percentile(dz, 0.5)").alias("bias")))
    corr = AL.subtract_scalar(dod, bias)
    return corr.groupBy(zone).agg(
        F.count("*").alias("n_px"),
        F.round(F.expr("percentile(dz, 0.5)"), 6).alias("med_dz"),
        F.round(F.stddev_pop("dz"), 6).alias("sd_dz"),
        F.round(F.sqrt(F.avg(F.col("dz") * F.col("dz"))), 6).alias("rms_dz"),
    )


DOD_SQL = "WITH " + _DOD_REGRID_CTES + """,
dod AS (
  SELECT b.row, b.col, b.value - a.value_a AS dz
  FROM pb b JOIN a_on_b a ON b.row = a.row AND b.col = a.col
),
bias AS (
  SELECT quantile_cont(dz, 0.5) AS bias FROM dod
  WHERE (row * 7 + col) % 5 = 0
)
SELECT (row * 7 + col) % 5 AS zone_id,
       count(*) AS n_px,
       round(quantile_cont(dz - bias, 0.5), 6) AS med_dz,
       round(stddev_pop(dz - bias), 6) AS sd_dz,
       round(sqrt(avg(power(dz - bias, 2))), 6) AS rms_dz
FROM dod CROSS JOIN bias
GROUP BY 1
"""


# --------------------------------------------------------------------------
# E3 — the WHOLE analysis chain as one lazy DAG (pipeline.analyze_pair's
# relational spine, notebook cells [10]→[89]): align → DoD → median-bias
# subtract → zonal stats → variogram bins → Hugonnet σ_A, fused into a
# single labeled-union DataFrame. The non-relational model fit (U2,
# numpy LM) is INJECTED as fixed (sills, ranges, nugget) so every
# relational stage is end-to-end restatable in ANSI SQL.
# Fixture: the same raster pair as j1_r4_dod (A 100×100 res 1 regridded
# onto B 50×50 res 2 offset-origin, tie-free nearest).
# --------------------------------------------------------------------------

def pipeline_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from error_analysis_spark.pipeline import analyze_pair_chain
    a, b = _dod_raster_pair(spark, sf_dir)
    return analyze_pair_chain(a, b, _DOD_GRID_A, _DOD_GRID_B)


_CHAIN_COV = ("((0.04 + 0.002) - (0.002 + CASE WHEN {d} <= 30.0 "
              "THEN 0.04 * (1.5 * ({d} / 30.0) - 0.5 * power({d} / 30.0, 3)) "
              "ELSE 0.04 END)) / (0.04 + 0.002)")

PIPELINE_CHAIN_SQL = ("WITH " + _DOD_REGRID_CTES + """,
dod AS (
  SELECT b.row, b.col,
         0.25 + (b.col + 0.5) * 2.0 AS x,
         100.125 - (b.row + 0.5) * 2.0 AS y,
         CAST((b.row * 7 + b.col) % 5 AS BIGINT) AS zone_id,
         b.value - a.value_a AS dz
  FROM pb b JOIN a_on_b a ON b.row = a.row AND b.col = a.col
),
biasrow AS (
  SELECT quantile_cont(dz, 0.5) AS bias, count(*) AS n_stable
  FROM dod WHERE zone_id = 0
),
corr AS (
  SELECT d.row, d.col, d.x, d.y, d.zone_id, d.dz - b.bias AS dz
  FROM dod d CROSS JOIN biasrow b
),
vsamp AS (
  SELECT CAST(row AS BIGINT) * 50 + col AS sid, x, y,
         CAST(round(dz, 6) AS DECIMAL(18,6)) AS value
  FROM corr WHERE zone_id = 0
),
vpairs AS (
  SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist,
         (a.value - b.value) * (a.value - b.value) AS sq
  FROM vsamp a JOIN vsamp b ON a.sid < b.sid
),
vbin AS (
  SELECT CAST(floor(dist / 6.0) AS INTEGER) AS bin,
         count(*) AS pair_count, sum(sq) AS ssd_dec
  FROM vpairs WHERE dist <= 30.0 GROUP BY 1
),
spx AS (
  SELECT CAST(row AS BIGINT) * 50 + col AS px_id, x, y
  FROM corr WHERE zone_id = 1
),
sn AS (SELECT count(*) AS n FROM spx),
centers AS (
  SELECT x AS cx, y AS cy, md5(CAST(px_id AS VARCHAR)) AS center_id
  FROM spx ORDER BY md5(CAST(px_id AS VARCHAR)) LIMIT 40
),
sj AS (
  SELECT center_id,
         sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy)) AS d
  FROM spx, centers
),
srho AS (
  SELECT center_id, greatest(-1.0, least(1.0, {cov})) AS r FROM sj
),
spc AS (SELECT center_id, sum(r) AS sum_rho FROM srho GROUP BY center_id),
sm AS (SELECT avg(sum_rho) AS mean_sum_rho FROM spc)
SELECT 'bias' AS stage, CAST(NULL AS BIGINT) AS k, n_stable AS n,
       round(bias, 6) AS v1, CAST(NULL AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3
FROM biasrow
UNION ALL
SELECT 'zonal', zone_id, count(*),
       round(quantile_cont(dz, 0.5), 6), round(stddev_pop(dz), 6),
       round(sqrt(avg(dz * dz)), 6)
FROM corr GROUP BY zone_id
UNION ALL
SELECT 'vario', CAST(bin AS BIGINT), pair_count,
       CAST(round(ssd_dec, 4) AS DOUBLE),
       CASE WHEN pair_count >= 30
            THEN round(CAST(ssd_dec AS DOUBLE) / (2.0 * pair_count), 6) END,
       CAST(NULL AS DOUBLE)
FROM vbin
UNION ALL
SELECT 'sigma_a', NULL, NULL,
       round(sqrt(greatest((0.04 + 0.002) * mean_sum_rho / n, 0.0)), 6),
       NULL, NULL
FROM sm, sn
""").format(cov=_CHAIN_COV.format(d="d"))


# --------------------------------------------------------------------------
# E3-multi — the chain with the reference's CANONICAL multi-run
# variography (n_runs=4 here; notebook cell [78] runs 30): align → DoD
# → bias subtract → seeded n_runs-fold sampling of the stable zone
# (sample_pixels_multi_lazy: md5 order statistic, in-plan n_target —
# zero jobs until the action) → per-run pair bins + Matheron → A5
# cross-run reduce (mean_variogram). The oracle restates the sampler
# EXACTLY (same md5 prefix hash, same Bernoulli pre-filter, same
# per-run row_number ≤ n_target) — selection parity is part of what
# this query verifies, not just the aggregates.
# Fixture: the same raster pair as j1_r4_dod / pipeline_chain.
# --------------------------------------------------------------------------

def pipeline_chain_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from error_analysis_spark.pipeline import analyze_pair_chain_multi
    a, b = _dod_raster_pair(spark, sf_dir)
    return analyze_pair_chain_multi(a, b, _DOD_GRID_A, _DOD_GRID_B)


PIPELINE_CHAIN_MULTI_SQL = "WITH " + _DOD_REGRID_CTES + """,
dod AS (
  SELECT b.row, b.col,
         0.25 + (b.col + 0.5) * 2.0 AS x,
         100.125 - (b.row + 0.5) * 2.0 AS y,
         CAST((b.row * 7 + b.col) % 5 AS BIGINT) AS zone_id,
         b.value - a.value_a AS dz
  FROM pb b JOIN a_on_b a ON b.row = a.row AND b.col = a.col
),
biasrow AS (
  SELECT quantile_cont(dz, 0.5) AS bias, count(*) AS n_stable
  FROM dod WHERE zone_id = 0
),
stable AS (
  SELECT CAST(d.row AS BIGINT) * 2147483648 + d.col AS pid, d.x, d.y,
         CAST(round(d.dz - br.bias, 6) AS DECIMAL(18,6)) AS value
  FROM dod d CROSS JOIN biasrow br WHERE d.zone_id = 0
),
-- sample_pixels_multi_lazy restated: n_target = min(max_samples=120,
-- floor(n_valid * res^2 * spa / area^2) = floor(n_valid * 4 * 10000
-- / 62500), n_valid); pre-filter mean = 1.5t + 6 sqrt(t) + 16
tgt AS (
  SELECT n_valid,
         least(120, greatest(1, CAST(floor(n_valid * 4.0 * 10000.0
                                           / 62500.0) AS BIGINT)),
               n_valid) AS n_target
  FROM (SELECT count(*) AS n_valid FROM stable)
),
thr AS (
  SELECT n_target,
         least(1.0, (1.5 * n_target + 6.0 * sqrt(n_target) + 16.0)
                    / n_valid) * 1152921504606846976.0 AS h_thr
  FROM tgt
),
fan AS (
  SELECT s.*, r.run,
         ('0x' || substr(md5(s.pid || ':' || r.run || ':' || 42),
                         1, 15))::BIGINT AS h
  FROM stable s
  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS run) r
),
samp AS (
  SELECT run, pid AS sid, x, y, value
  FROM (
    SELECT f.run, f.pid, f.x, f.y, f.value, t.n_target,
           row_number() OVER (PARTITION BY f.run
                              ORDER BY f.h, f.pid) AS rn
    FROM fan f CROSS JOIN thr t
    WHERE CAST(f.h AS DOUBLE) < t.h_thr
  ) WHERE rn <= n_target
),
vpairs AS (
  SELECT a.run,
         sqrt((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y)) AS dist,
         (a.value - b.value) * (a.value - b.value) AS sq
  FROM samp a JOIN samp b ON a.run = b.run AND a.sid < b.sid
),
vbin AS (
  SELECT run, CAST(floor(dist / 6.0) AS INTEGER) AS bin,
         count(*) AS pair_count, sum(sq) AS ssd_dec
  FROM vpairs WHERE dist <= 30.0 GROUP BY 1, 2
),
per_run AS (
  SELECT run, bin, pair_count, ssd_dec,
         CASE WHEN pair_count >= 30
              THEN CAST(ssd_dec AS DOUBLE) / (2.0 * pair_count)
         END AS gamma
  FROM vbin
)
SELECT 'bias' AS stage, CAST(NULL AS BIGINT) AS run,
       CAST(NULL AS BIGINT) AS k, n_stable AS n,
       round(bias, 6) AS v1, CAST(NULL AS DOUBLE) AS v2,
       CAST(NULL AS DOUBLE) AS v3, CAST(NULL AS DOUBLE) AS v4
FROM biasrow
UNION ALL
SELECT 'vario', CAST(run AS BIGINT), CAST(bin AS BIGINT), pair_count,
       CAST(round(ssd_dec, 4) AS DOUBLE), round(gamma, 6), NULL, NULL
FROM per_run
UNION ALL
-- stddev_samp of one value is NULL here (ANSI); the Spark side guards
-- its NaN with F.when(count > 1, stddev_samp) to reduce identically
SELECT 'vario_mean', NULL, CAST(bin AS BIGINT), count(gamma),
       round(avg(gamma), 6), round(stddev_samp(gamma), 6),
       round((quantile_cont(gamma, 0.975)
              - quantile_cont(gamma, 0.025)) / 2.0, 6),
       round(avg(pair_count), 4)
FROM per_run GROUP BY bin
"""


RASTER_QUERIES: dict[str, tuple] = {
    "r2_focal_all": (r2_focal_all, R2ALL_SQL),
    "s8_grid_max": (s8_grid_max, S8MAX_SQL),
    "s8_grid_idw": (s8_grid_idw, S8IDW_SQL),
    "r3_fill_all": (r3_fill_all, R3ALL_SQL),
    "r7_polygonize": (r7_polygonize, R7_SQL),
    "j1_r4_dod": (j1_r4_dod, DOD_SQL),
    "pipeline_chain": (pipeline_chain, PIPELINE_CHAIN_SQL),
    "pipeline_chain_multi": (pipeline_chain_multi, PIPELINE_CHAIN_MULTI_SQL),
}
