"""Persisted IVF-flat ANN index over parquet — the durable form of the
similarity layer's scale path.

`similarity.ivf_topk` trains its coarse quantizer per call, which is
right for exploration and wrong for production: an index you query a
thousand times must be CLUSTERED ON DISK so each probe is a
partition-pruned scan, not a full pass plus a filter. This module
persists exactly that layout (the classic IVF-flat design, e.g. the
inverted-file structure of Jégou et al. 2011, mapped onto parquet):

- `write_ivf_index`: unit-normalize → MLlib KMeans (deterministic for
  a seed) → assign `list_id` → `partitionBy("list_id")` parquet for
  the vectors, plus a tiny `centroids` parquet next to it. At 100 TB
  the vectors table is the big artifact; one shuffle on `list_id`
  lays it out so every cell is a contiguous directory.
- `query_ivf`: read the centroid table (tiny — collect to the
  driver), rank cells against the query, and scan ONLY the `n_probe`
  nearest cell directories — the `list_id IN (...)` predicate prunes
  at the PARTITION level (visible as PartitionFilters in the scan
  node, asserted in tests), so IO scales with probed cells, not
  corpus size. Exact cosine within the probed cells, global top-k via
  TakeOrderedAndProject.

Querying with `n_probe = n_lists` degenerates to exact brute force
over a partitioned scan — the recall/latency knob is explicit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.extensions.similarity import (
    _as_double,
    cosine,
    l2_norm,
)


def write_ivf_index(embeddings: DataFrame, path: str, n_lists: int = 16,
                    seed: int = 42, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> int:
    """Cluster, assign and persist the IVF layout; returns n_lists.

    Layout: `{path}/vectors/list_id=*/...parquet` (raw vector + id per
    row) and `{path}/centroids/` (list_id, center array<double>).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    varr = _as_double(F.col(vec_col))
    ds = (embeddings
          .select(F.col(id_col), F.col(vec_col), varr.alias("_v"))
          .withColumn("_nrm", F.greatest(l2_norm(F.col("_v")),
                                         F.lit(1e-300)))
          .withColumn("_u", F.transform(
              F.col("_v"), lambda x: x / F.col("_nrm")))
          .withColumn("features", array_to_vector("_u")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="features",
                predictionCol="list_id")
    model = km.fit(ds)
    assigned = model.transform(ds).select(id_col, vec_col, "list_id")
    (assigned.repartition("list_id")
     .write.mode("overwrite").partitionBy("list_id")
     .parquet(os.path.join(path, "vectors")))
    spark = embeddings.sparkSession
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(model.clusterCenters())]
    (spark.createDataFrame(centers, "list_id int, center array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "centroids")))
    return n_lists


def query_ivf(spark: SparkSession, path: str, query_vec: list[float],
              k: int = 10, n_probe: int = 4,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Partition-pruned IVF probe: top-k ids by exact cosine within the
    `n_probe` cells whose centroids are nearest the unit query."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-300)
    cents = spark.read.parquet(os.path.join(path, "centroids")).collect()
    order = sorted(
        cents,
        key=lambda r: float(((np.asarray(r["center"]) - q) ** 2).sum()))
    probe = [int(r["list_id"]) for r in order[:n_probe]]

    vecs = spark.read.parquet(os.path.join(path, "vectors"))
    qcol = F.array(*[F.lit(float(v)) for v in q])
    return (vecs.where(F.col("list_id").isin(probe))
            .select(F.col(id_col),
                    F.round(cosine(_as_double(F.col(vec_col)), qcol), 6)
                    .alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))
