"""Sketch-style scale primitives: KMV distinct-count sketches,
vocabulary heavy hitters, and int8 embedding quantization.

At 100 TB you cannot afford exact `COUNT(DISTINCT)` per high-cardinality
group or full-precision float32 embeddings in the ANN working set.
These operators are the deterministic (hence oracle-checkable) versions
of the usual probabilistic tools:

- **KMV (k-minimum-values)** distinct sketch (Bar-Yossef et al. 2002):
  hash every value to a uniform in (0,1) and keep the k smallest per
  group; if fewer than k distinct hashes exist the count is exact,
  otherwise estimate (k-1)/u_(k). Unlike HyperLogLog the estimator is
  a pure function of md5 hashes, so Spark and DuckDB agree bit-for-bit
  — and the k-set is mergeable (union two sketches = merge-sort and
  re-truncate to k), which is what makes it a partial aggregate at
  scale. The Spark plan keys one shuffle on the group and ranks
  per-group (bounded windows, no global sort).
- **Vocabulary top-k**: token heavy hitters with document-frequency
  floor — the vocab-building pass of a tokenizer pipeline. Aggregates
  are map-side-combinable counts; the final top-k is a
  TakeOrderedAndProject (never a full sort of the vocabulary).
- **int8 quantization**: per-vector symmetric scale (max-abs / 127),
  integer code stats and sequential-fold reconstruction error. Cuts
  the ANN memory footprint 4x; codes and checksums are integers, so
  exact across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def _hash_u(col) -> F.Column:
    """md5-derived uniform in (0,1] — identical arithmetic in DuckDB."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return (h.cast("long") + F.lit(1)) / F.lit(_TWO60)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns (group, n_kept, est_distinct): exact when the group has
    < k distinct values, else the KMV estimator (k-1)/u_(k), rounded
    to 4 decimals. One shuffle on the group key; the rank window is
    per-group (parallel, bounded by group size — and a production
    variant would pre-truncate per partition before the shuffle)."""
    hashed = (df.select(group_col, value_col).distinct()
              .withColumn("_u", _hash_u(F.col(value_col))))
    w = Window.partitionBy(group_col).orderBy("_u")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") <= k)
    return (ranked.groupBy(group_col)
            .agg(F.count("*").alias("n_kept"),
                 F.max("_u").alias("_uk"))
            .select(
                group_col, "n_kept",
                F.round(
                    F.when(F.col("n_kept") < k,
                           F.col("n_kept").cast("double"))
                    .otherwise((k - 1) / F.col("_uk")), 4)
                .alias("est_distinct")))


_HLL_P = 9                      # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
_HLL_W = 60 - _HLL_P            # rest-bits of the 60-bit md5 prefix
# alpha_m for m >= 128 (Flajolet et al. 2007), baked to a literal so
# both engines consume identical digits
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# linear-counting estimates round(m·ln(m/V)) for V = 1..m-1, BAKED to
# integers at import: ln is the one libm call whose last ulp differs
# between Java's Math.log and DuckDB's glibc ln, and a 1-ulp flip at a
# .5 boundary would break the exact-equality oracle — a lookup keyed
# on the (integer) empty-register count has no float path at all
_HLL_LC = [round(_HLL_M * math.log(_HLL_M / v))
           for v in range(1, _HLL_M)]


def hll_distinct(df: DataFrame, group_col: str,
                 value_col: str) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate — the
    register-based counterpart to `kmv_distinct`, in EXACT integer
    bit arithmetic so DuckDB reproduces every register.

    The 60-bit md5 prefix splits into a 9-bit register index and a
    51-bit rest; the rank rho = 52 − bitlength(rest) is computed via
    `length(bin(rest))` — a pure integer path, no float log2 whose
    last-ulp could flip a floor across engines. The register table is
    a (group, bucket) MAX aggregate: map-side combinable, mergeable
    (sketch union = elementwise max), bounded by groups × 512 rows at
    ANY corpus size — this is why HLL beats exact COUNT(DISTINCT) at
    100 TB, where the distinct shuffle is value-cardinality-sized.
    The 2^{-M_j} harmonic sum is fixed-pointed at 2^52 (every term an
    exact power of two, the integer sum order-independent); the only
    floats are the final estimator divisions, identical expressions
    on both engines. Small-range path: linear counting m·ln(m/V) when
    the raw estimate ≤ 2.5m and empty registers remain — served from
    the baked integer lookup `_HLL_LC` keyed on V, so no runtime ln
    whose last ulp could differ between libm implementations.

    Returns (group_col, n_est) with n_est rounded to integer."""
    return hll_estimate(hll_registers(df, group_col, value_col),
                        group_col)


def hll_registers(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """The mergeable half of the HLL sketch: per-(group, bucket) max
    rank. Register tables over different row sets merge by union +
    the same (group, bucket) MAX — the partial-aggregate property the
    merge property-test pins. Returns (group_col, _bucket, _m)."""
    from error_analysis_spark.extensions.text import md5_prefix_long
    h = md5_prefix_long(F.col(value_col).cast("string"))
    bucket = F.shiftright(h, _HLL_W).alias("_bucket")
    rest = h.bitwiseAND(F.lit((1 << _HLL_W) - 1))
    rho = (F.when(rest == 0, F.lit(_HLL_W + 1))
           .otherwise(F.lit(_HLL_W + 1) - F.length(F.bin(rest))))
    return (df.select(F.col(group_col), bucket, rho.alias("_rho"))
            .groupBy(group_col, "_bucket")
            .agg(F.max("_rho").alias("_m")))


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Estimator over a register table from `hll_registers` — or over
    a union of several register tables re-collapsed with
    `groupBy(group, _bucket).agg(max(_m))` (sketch merge)."""
    # term = 2^(52 - M_j), an exact long; sum is order-independent
    term = F.expr(f"CAST(1 AS BIGINT) << ({_HLL_W + 1} - _m)")
    per = (regs.groupBy(group_col)
           .agg(F.count("*").alias("_nregs"),
                F.sum(term).alias("_s")))
    two52 = float(1 << (_HLL_W + 1))
    v = F.lit(_HLL_M) - F.col("_nregs")
    # empty registers contribute 2^-0 = 1 each to the harmonic sum,
    # i.e. 2^52 per empty register in fixed point (V·2^52 ≤ 2^61,
    # no overflow)
    s_full = F.col("_s") + v * F.lit(1 << (_HLL_W + 1))
    raw = (F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M * two52
           / s_full.cast("double"))
    lc = F.element_at(F.array(*[F.lit(int(x)) for x in _HLL_LC]),
                      v.cast("int"))
    est = F.when((raw <= 2.5 * _HLL_M) & (v > 0), lc) \
        .otherwise(F.round(raw).cast("long"))
    return per.select(F.col(group_col), est.alias("n_est"))


def hll_distinct_sql(table: str, group_col: str, value_col: str) -> str:
    """DuckDB oracle for `hll_distinct` — same integer register path."""
    w, m, a = _HLL_W, _HLL_M, _HLL_ALPHA
    return f"""
WITH h AS (
  SELECT {group_col},
         CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))
              AS BIGINT) AS hv
  FROM {table}
),
b AS (
  SELECT {group_col}, hv >> {w} AS bucket,
         hv & ((CAST(1 AS BIGINT) << {w}) - 1) AS rest
  FROM h
),
regs AS (
  SELECT {group_col}, bucket,
         max(CASE WHEN rest = 0 THEN {w + 1}
                  ELSE {w + 1} - length(bin(rest)) END) AS m
  FROM b GROUP BY {group_col}, bucket
),
per AS (
  SELECT {group_col}, count(*) AS nregs,
         sum(CAST(1 AS BIGINT) << ({w + 1} - m))
         + ({m} - count(*)) * (CAST(1 AS BIGINT) << {w + 1}) AS s
  FROM regs GROUP BY {group_col}
)
SELECT {group_col},
       CASE WHEN ({a}::DOUBLE * {m} * {m}
                  * {float(1 << (w + 1))}::DOUBLE
                  / CAST(s AS DOUBLE)) <= {2.5 * m}::DOUBLE
              AND ({m} - nregs) > 0
            THEN (CAST({list(_HLL_LC)} AS BIGINT[]))[{m} - nregs]
            ELSE CAST(round({a}::DOUBLE * {m} * {m}
                            * {float(1 << (w + 1))}::DOUBLE
                            / CAST(s AS DOUBLE)) AS BIGINT) END AS n_est
FROM per
"""


def vocab_topk(docs: DataFrame, k: int = 50, min_df: int = 2,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent tokens with
    document frequency >= min_df, ties broken by token. Token counts
    are map-side-combinable; df comes from the (token, doc) distinct;
    the final k rows come off a TakeOrderedAndProject, not a sort of
    the whole vocabulary."""
    from error_analysis_spark.extensions.text import tokens
    pairs = docs.select(F.col(id_col).alias("_id"),
                        F.explode(tokens(text_col)).alias("token"))
    stats = pairs.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("_id").alias("df"))
    return (stats.where(F.col("df") >= min_df)
            .orderBy(F.desc("tf"), F.asc("token"))
            .limit(k))


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization stats per vector.

    code_i = round(127 * x_i / max_abs) in [-127, 127]. Returns integer
    code aggregates (exact across engines: code_sum, positional
    code_checksum = sum (i+1)*code_i, n_sat saturated codes) plus the
    rounded scale and sequential-fold reconstruction MSE. Pure
    expression pipeline — no shuffle, no UDF."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0),
                       lambda a, x: F.greatest(a, F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(amax > 0, F.transform(
        v, lambda x: F.round(x / scale).cast("long"))) \
        .otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    n = F.size(F.col(vec_col))
    code_sum = F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c)
    # index via the 2-arg transform lambda, NOT sequence(1, n):
    # sequence(1, 0) on an EMPTY vector counts DOWN to [1, 0] and the
    # zip_with null-pads — checksum came out NULL instead of 0
    checksum = F.transform(
        codes, lambda c, i: c * (i + 1).cast("long"))
    code_checksum = F.aggregate(checksum, F.lit(0).cast("long"),
                                lambda a, c: a + c)
    n_sat = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda a, c: a + (F.abs(c) == 127).cast("long"))
    mse = F.when(amax > 0, F.aggregate(
        F.zip_with(v, codes, lambda x, c: F.pow(x - c * scale, F.lit(2.0))),
        F.lit(0.0), lambda a, e: a + e) / n).otherwise(F.lit(0.0))
    return emb.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        code_sum.alias("code_sum"),
        code_checksum.alias("code_checksum"),
        n_sat.alias("n_sat"),
        F.round(mse, 9).alias("mse"))


def oov_stats(docs: DataFrame, vocab_k: int = 64, min_df: int = 2,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-vocabulary coverage: per-document out-of-vocabulary
    token fraction against the corpus' own top-`vocab_k` vocabulary
    (`vocab_topk`, df >= min_df, ties by token).

    Scale shape: the vocab is top-k — tiny by construction — so the
    membership probe is a BROADCAST semi-join on the exploded token
    table (one map-side stage over the corpus; the only shuffle is the
    per-doc count aggregate, map-side-combinable). A corpus whose OOV
    mass is high needs a bigger tokenizer vocab — this is the signal a
    data team reads before committing a vocab size.

    Returns (doc_id, n_tokens, n_oov, oov_frac); empty docs carry NULL
    oov_frac (same `_nz` rule as the quality gates).
    """
    from error_analysis_spark.extensions.text import _nz, tokens
    vocab = vocab_topk(docs, k=vocab_k, min_df=min_df,
                       text_col=text_col, id_col=id_col).select("token")
    toks = docs.select(F.col(id_col).alias("_id"),
                       F.explode_outer(tokens(text_col)).alias("token"))
    # ONE pass over the exploded corpus: the broadcast vocab tags each
    # token (left join, _hit NULL on miss — NULL join keys of empty
    # docs also miss), and a single map-side-combinable aggregate
    # counts total and in-vocab together; a semi-join + second
    # aggregate + re-join would tokenize and shuffle the corpus twice
    hit = F.broadcast(vocab.withColumn("_hit", F.lit(1)))
    counted = (toks.join(hit, "token", "left")
               .groupBy("_id")
               .agg(F.count("token").alias("n_tokens"),
                    F.count("_hit").alias("n_in")))
    return counted.select(
        F.col("_id").alias(id_col), "n_tokens",
        (F.col("n_tokens") - F.col("n_in")).alias("n_oov"),
        F.round((F.col("n_tokens") - F.col("n_in"))
                / _nz(F.col("n_tokens")), 6).alias("oov_frac"))


def cms_topk(docs: DataFrame, d: int = 4, w: int = 1024, k: int = 20,
             text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Count-Min sketch token-frequency estimates, audited against the
    exact counts for the top-k tokens.

    The CMS (Cormode & Muthukrishnan 2005) is the mergeable
    fixed-memory answer to "how often does token X occur" at corpus
    scale: d hash rows × w counters; est(x) = min_j cell[j, h_j(x)],
    always >= the true count (one-sided error, E[over] <= 2N/w per
    row). Every stage here is a bounded hash aggregate:

    - token counts: map-side-combinable (token) agg — the only
      corpus-sized shuffle;
    - sketch cells: the VOCAB (not the corpus) explodes d rows and
      re-aggregates into at most d*w cells — a fixed-size table that
      IS the serialized sketch (union two corpora = add cell-wise);
    - the audit probes the k heaviest tokens through the same hashes
      (broadcast join against the tiny cell table) and reports
      est - exact, which is the sketch's actual collision overcount.

    Hashes are md5-derived (`h_j(x) = md5(j:x) mod w`), so DuckDB
    reproduces the sketch bit-for-bit. Returns (token, tf, tf_est,
    overcount) for the top-k tokens by exact tf (ties by token).
    """
    from error_analysis_spark.extensions.text import tokens
    tf = (docs.select(F.explode(tokens(text_col)).alias("token"))
          .groupBy("token").agg(F.count("*").alias("tf")))
    tf = tf.persist()
    try:
        # ONE definition of the cell hash — the probe reuses the
        # hashed frame (semi-join against the top-k tokens), so sketch
        # build and audit probe can never hash into different cells
        j = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j")
        hashed = tf.select("token", "tf", j).withColumn(
            "col",
            F.conv(F.substring(
                F.md5(F.concat(F.col("j").cast("string"), F.lit(":"),
                               F.col("token"))), 1, 15), 16, 10)
            .cast("long") % w)
        cells = hashed.groupBy("j", "col").agg(
            F.sum("tf").alias("cell"))
        top = (tf.orderBy(F.desc("tf"), F.asc("token")).limit(k))
        probe = hashed.join(F.broadcast(top.select("token")),
                            "token", "left_semi")
        est = (probe.join(cells, ["j", "col"])
               .groupBy("token", "tf")
               .agg(F.min("cell").alias("tf_est")))
        out = est.select(
            "token", "tf", "tf_est",
            (F.col("tf_est") - F.col("tf")).alias("overcount"))
        # materialize before releasing the shared tf lineage
        out = out.localCheckpoint(eager=True)
    finally:
        tf.unpersist()
    return out


def robust_outliers(df: DataFrame, group_col: str, value_col: str,
                    scale: int = 100, z_x10000: int = 35000) -> DataFrame:
    """Per-group robust outlier counts via median/MAD (Iglewicz-Hoaglin
    modified z-score), computed entirely on the bounded fixed-point
    histogram — no per-group sort of the raw data at any width.

    Flag x when 0.6745 * |x - median| / MAD > z. All comparisons run
    in INTEGER grid units (6745 * dev_fp > z_x10000 * mad_fp), so the
    threshold decision is exact and identical across engines — no
    float boundary can flip a flag. Three bounded stages:

    1. median per group: `grouped_quantiles` histogram (grid-bounded);
    2. MAD: histogram of |x_fp - med_fp| (same grid bound), same
       smallest-value-reaching-ceil(n/2) rank rule;
    3. flags: map-side compare against the broadcast (group, med, mad)
       table + one count aggregate.

    Groups whose MAD is 0 (over half the mass on one grid value)
    report NULL n_outliers — the score is undefined there, and a
    data-quality pipeline should treat "zero dispersion" as its own
    signal rather than divide by it. Returns (group, n, median, mad,
    n_outliers) with median/MAD back on the value scale.
    """
    v_fp = F.round(F.col(value_col) * scale).cast("long")
    vals = (df.select(F.col(group_col), v_fp.alias("_v"))
            .where(F.col("_v").isNotNull()))
    # med and the deviation histogram are BOUNDED (|groups|, resp.
    # |groups| x grid) but their lineages scan the corpus — cache them
    # so the two corpus passes (median build, deviation build) happen
    # exactly once; the bounded result is materialized eagerly and the
    # caches released before returning (jaccard_pairs discipline)
    med = (grouped_quantiles(df, group_col, value_col, qs=(0.5,),
                             scale=scale)
           .select(group_col,
                   F.round(F.col("v") * scale).cast("long")
                   .alias("_med"))).persist()
    dev = (vals.join(F.broadcast(med), group_col)
           .select(group_col, F.abs(F.col("_v") - F.col("_med"))
                   .alias("_d")))
    dhist = dev.groupBy(group_col, "_d") \
        .agg(F.count("*").alias("_c")).persist()
    try:
        # MAD = the grouped-quantile median of the deviation histogram
        w_cum = (Window.partitionBy(group_col).orderBy("_d")
                 .rowsBetween(Window.unboundedPreceding, 0))
        w_all = (Window.partitionBy(group_col)
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
        dcum = (dhist.withColumn("_cum", F.sum("_c").over(w_cum))
                .withColumn("_n", F.sum("_c").over(w_all)))
        mad = (dcum.where(F.col("_cum") >= F.ceil(F.col("_n") / 2))
               .groupBy(group_col)
               .agg(F.min("_d").alias("_mad"), F.min("_n").alias("n")))
        # outlier counts come from the HISTOGRAM, not a second corpus
        # pass: every row with deviation bin _d is flagged iff
        # 6745*_d > z*MAD, so summing bin counts is exact
        outc = (dhist.join(F.broadcast(mad.select(group_col, "_mad")),
                           group_col)
                .where(F.lit(6745) * F.col("_d")
                       > F.lit(z_x10000) * F.col("_mad"))
                .groupBy(group_col).agg(F.sum("_c").alias("_n_out")))
        out = (mad.join(med, group_col)
               .join(outc, group_col, "left")
               .select(
                   group_col, "n",
                   F.round(F.col("_med") / scale, 6).alias("median"),
                   F.round(F.col("_mad") / scale, 6).alias("mad"),
                   F.when(F.col("_mad") > 0,
                          F.coalesce(F.col("_n_out"),
                                     F.lit(0).cast("long")))
                   .alias("n_outliers")))
        out = out.localCheckpoint(eager=True)
    finally:
        med.unpersist()
        dhist.unpersist()
    return out


def grouped_quantiles(df: DataFrame, group_col: str, value_col: str,
                      qs: tuple = (0.5, 0.9, 0.99),
                      scale: int = 100) -> DataFrame:
    """Exact per-group discrete quantiles without a per-group sort:
    values are fixed-pointed to a 1/scale grid, so the per-(group,
    value) histogram is bounded by |groups| x grid regardless of row
    count; cumulative counts over THAT table (histogram-sized windows,
    never corpus-sized) locate each quantile as the smallest grid value
    whose cumulative count reaches ceil(q*n) — percentile_disc
    semantics. This is the relational form of a KLL/t-digest pass with
    an exactness guarantee at grid resolution, and the same shape
    `quality_prune` uses for its global selection.

    The target rank is computed in INTEGER arithmetic — q is snapped
    to 1/10000 and rank = (q_i*n + 9999) div 10000 ≡ ceil(q_i*n/1e4).
    A float `ceil(q*n)` silently picks the wrong rank whenever q*n
    rounds up across an integer (e.g. 0.07*100 = 7.000000000000001 →
    ceil 8): 2,821 (q, n) combos under n=20k are off by one that way.

    Returns (group, q, v) with v back on the value scale. NULL values
    carry no mass.
    """
    v_fp = F.round(F.col(value_col) * scale).cast("long")
    hist = (df.withColumn("_v", v_fp).where(F.col("_v").isNotNull())
            .groupBy(group_col, "_v").agg(F.count("*").alias("_c")))
    w_cum = (Window.partitionBy(group_col).orderBy("_v")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.partitionBy(group_col)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cum = (hist.withColumn("_cum", F.sum("_c").over(w_cum))
           .withColumn("_n", F.sum("_c").over(w_all)))
    qcol = F.explode(F.array(*[
        F.struct(F.lit(float(q)).alias("q"),
                 F.lit(int(round(float(q) * 10000))).cast("long")
                 .alias("qi"))
        for q in qs])).alias("_q")
    rank = F.expr("(_q.qi * _n + 9999) div 10000")
    hit = (cum.select(group_col, "_v", "_cum", "_n", qcol)
           .where(F.col("_cum") >= rank))
    return (hit.groupBy(group_col, F.col("_q.q").alias("q"))
            .agg(F.min("_v").alias("_vq"))
            .select(group_col, "q",
                    F.round(F.col("_vq") / scale, 6).alias("v")))
