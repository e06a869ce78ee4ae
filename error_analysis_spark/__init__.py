"""error_analysis_spark — a PySpark-native geostatistical analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference toolkit (Cassandra-Brigham/error_analysis):
raster differencing, zonal statistics, empirical variography, variogram
model fitting, and spatially-correlated uncertainty propagation — all as
lazy DataFrame plans over long-format pixel/point/zone tables, designed
for horizontal scale (partitioned Parquet, broadcast dimension joins,
bucketed range self-joins, Arrow-batched pandas UDFs for the few
genuinely non-relational kernels).

Data model (SURVEY.md §1.4):
  pixels  : dataset_id STRING, band INT, row INT, col INT,
            x DOUBLE, y DOUBLE, value DOUBLE   (NULL value = nodata)
  grids   : dataset_id, crs, x0, y0, res, width, height, nodata
  points  : x, y, z, classification, gps_time, return_number
  zones   : zone_id, kind ('stable'|'unstable'), name, wkt
"""

__version__ = "0.1.0"

from error_analysis_spark.session import get_spark  # noqa: F401
