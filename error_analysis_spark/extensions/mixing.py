"""Data-mixing operators for training-corpus composition: stratified
seeded sampling (epoch weighting), deterministic global training order,
and GPT-style concat-and-chunk sequence packing.

These extend the curation layer (curation.py) with the three operations
a pretraining pipeline runs AFTER filtering/dedup: decide how much of
each stratum to keep (or repeat), fix a reproducible global shuffle
order, and pack variable-length documents into fixed token-budget
chunks (the "concatenate then split every B tokens" scheme used by
GPT/T5-style training — public knowledge, e.g. Brown et al. 2020 §2.2).

Scale design (100 TB):

- Sampling is a pure map-side expression: one md5 per row against a
  broadcast rates table, no shuffle at all. Upsampling (rate > 1)
  explodes rows map-side; fractional parts use the same hash uniform so
  the whole decision is deterministic and partitioning-independent.
- A global `row_number() OVER (ORDER BY key)` is a single-partition
  funnel in Spark — the classic scale killer. Both the training order
  and the packing prefix-sum instead use a TWO-PHASE prefix scan: the
  hash key's leading byte is a bucket (256 uniform buckets), windows
  partition BY BUCKET (bounded, parallel), and the 256 per-bucket
  totals are cumulated on the driver side of a tiny aggregate and
  joined back as broadcast offsets. Because the bucket is a prefix of
  the sort key, (bucket, key) order IS key order — the result is
  bit-identical to the naive global window, at 256-way parallelism
  (use more hex chars for more buckets on a real cluster).
- All hash arithmetic is md5-derived (`conv(substr(md5(x),1,15),16,10)`)
  so every operator here is exactly reproducible in the DuckDB oracle —
  including the double-precision uniforms, which are the same IEEE
  division on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def hash_key(col: Column, seed: int) -> Column:
    """Deterministic 32-hex-char shuffle key for a row id."""
    return F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))


def hash_uniform(col: Column, seed: int) -> Column:
    """Deterministic uniform double in [0, 1) from a row id.

    15 hex chars = 60 bits, exact in a double; the division is the same
    IEEE op in DuckDB (`('0x'||substr(md5(..),1,15))::BIGINT / 2^60`).
    """
    h = hash_key(col, seed)
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
            / F.lit(_TWO60))


# --------------------------------------------------------------------------
# Stratified seeded sampling / epoch weighting
# --------------------------------------------------------------------------

def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      stratum_col: str = "source",
                      id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Sample (or repeat) each stratum at its target rate.

    `rates` maps stratum value -> sampling rate. rate <= 1 keeps that
    fraction of the stratum; rate > 1 repeats documents (epoch
    weighting): every doc gets floor(rate) copies plus one more with
    probability frac(rate). Strata absent from `rates` are dropped.

    The decision per row is `u = hash_uniform(id)` against the
    broadcast rate — deterministic, partitioning-independent, and
    shuffle-free (the explode happens map-side).
    """
    spark = docs.sparkSession
    rates_df = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, rate double")
    u = hash_uniform(F.col(id_col), seed)
    n_copies = (F.floor(F.col("rate")).cast("long")
                + (u < (F.col("rate") - F.floor(F.col("rate"))))
                .cast("long"))
    return (docs
            .join(F.broadcast(rates_df), stratum_col)
            .withColumn("n_copies", n_copies)
            .where(F.col("n_copies") >= 1)
            .withColumn("copy_nr",
                        F.explode(F.sequence(F.lit(1),
                                             F.col("n_copies"))))
            .drop("rate", "n_copies"))


# --------------------------------------------------------------------------
# Two-phase prefix scan (shared by training order and packing)
# --------------------------------------------------------------------------

def _with_bucketed_key(df: DataFrame, id_col: str, seed: int) -> DataFrame:
    k = hash_key(F.col(id_col), seed)
    return df.withColumn("_key", k).withColumn(
        "_bucket", F.substring(F.col("_key"), 1, 2))


def _bucket_offsets(per_bucket: DataFrame, total_col: str) -> DataFrame:
    """Cumulate the tiny (≤256-row) per-bucket totals into exclusive
    offsets. The window runs on ≤256 rows — not a funnel."""
    w = (Window.orderBy("_bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    return per_bucket.withColumn(
        "_offset", F.coalesce(F.sum(total_col).over(w), F.lit(0)))


def training_order(docs: DataFrame, id_col: str = "doc_id",
                   seed: int = 42) -> DataFrame:
    """Assign each doc a deterministic 1-based global shuffle position.

    Equivalent to `row_number() OVER (ORDER BY md5(seed:id), id)` but
    computed as per-bucket row_numbers plus broadcast bucket offsets —
    no single-partition window at any width.
    """
    keyed = _with_bucketed_key(docs.select(id_col), id_col, seed)
    counts = keyed.groupBy("_bucket").agg(F.count("*").alias("_n"))
    offsets = _bucket_offsets(counts, "_n").drop("_n")
    wb = Window.partitionBy("_bucket").orderBy("_key", id_col)
    return (keyed
            .withColumn("_rn", F.row_number().over(wb))
            .join(F.broadcast(offsets), "_bucket")
            .select(F.col(id_col),
                    (F.col("_offset") + F.col("_rn")).alias("position")))


# --------------------------------------------------------------------------
# Concat-and-chunk sequence packing
# --------------------------------------------------------------------------

def token_len(text_col: Column) -> Column:
    """Whitespace token count — delegates to the canonical tokenizer so
    pack_chunks budgets can never diverge from the text-layer counts."""
    from error_analysis_spark.extensions.text import tokens
    return F.size(tokens(text_col)).cast("long")


def pack_chunks(docs: DataFrame, chunk_tokens: int = 256,
                text_col: str = "text", id_col: str = "doc_id",
                seed: int = 42) -> DataFrame:
    """Concat-and-chunk packing: lay the corpus out in deterministic
    shuffle order as one virtual token stream and cut it every
    `chunk_tokens` tokens. Returns per-doc placement:

        doc_id, n_tok, start_tok, first_chunk, n_chunks

    where `start_tok` is the doc's offset in the stream (an exclusive
    prefix sum of token lengths in key order) and the doc spans chunks
    `first_chunk .. first_chunk + n_chunks - 1`. Zero-token docs are
    dropped (they occupy no chunk).

    The prefix sum is the same two-phase bucket scan as
    `training_order` — per-bucket running sums + broadcast bucket
    token offsets — so no global-sort funnel exists in the plan.
    """
    keyed = _with_bucketedlen(docs, text_col, id_col, seed)
    totals = keyed.groupBy("_bucket").agg(F.sum("n_tok").alias("_tot"))
    offsets = _bucket_offsets(totals, "_tot").drop("_tot")
    wb = (Window.partitionBy("_bucket").orderBy("_key", id_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    b = int(chunk_tokens)
    start = F.col("_offset") + F.coalesce(F.sum("n_tok").over(wb),
                                          F.lit(0).cast("long"))
    # `div` = exact integer division: token offsets at 100 TB exceed
    # 2^53, where a double floor(x / b) would silently misplace chunks.
    return (keyed
            .join(F.broadcast(offsets), "_bucket")
            .withColumn("start_tok", start.cast("long"))
            .selectExpr(
                id_col, "n_tok", "start_tok",
                f"start_tok div {b} AS first_chunk",
                f"((start_tok + n_tok - 1) div {b})"
                f" - (start_tok div {b}) + 1 AS n_chunks"))


def _with_bucketedlen(docs: DataFrame, text_col: str, id_col: str,
                      seed: int) -> DataFrame:
    keyed = _with_bucketed_key(
        docs.select(id_col, text_col), id_col, seed)
    return (keyed
            .withColumn("n_tok", token_len(F.col(text_col)))
            .where(F.col("n_tok") > 0)
            .drop(text_col))


# --------------------------------------------------------------------------
# Deterministic holdout split (train / val / test)
# --------------------------------------------------------------------------

def hash_split(docs: DataFrame, fracs: tuple = (0.9, 0.05, 0.05),
               names: tuple = ("train", "val", "test"),
               id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Assign every row to a named split by hashing its id.

    The split is a pure map-side expression: u = md5-uniform(id) lands
    in the half-open interval [cum_i, cum_{i+1}) of the cumulative
    fractions — no shuffle, no sampling state, and the assignment is
    stable under repartitioning AND under corpus growth (a doc keeps
    its split when new docs arrive, which per-partition `randomSplit`
    cannot guarantee). That stability is the property that makes the
    holdout trustworthy across pipeline re-runs.

    Returns the input plus a `split` column. Fractions must sum to
    <= 1; any residual mass (1 - sum) is dropped rows (split IS NULL
    filtered out), which doubles as a global downsample knob.
    """
    if len(fracs) != len(names):
        raise ValueError("fracs and names must align")
    total = float(sum(fracs))
    if total > 1.0 + 1e-12:
        raise ValueError(f"fracs sum to {total} > 1")
    cum = 0.0
    expr = F.lit(None).cast("string")
    # build the when-chain from the LAST interval backwards so the
    # first matching upper bound wins; hash computed once per row
    bounds = []
    for frac, name in zip(fracs, names):
        cum += float(frac)
        bounds.append((cum, name))
    for upper, name in reversed(bounds):
        expr = F.when(F.col("_u") < F.lit(upper), F.lit(name)) \
            .otherwise(expr)
    out = (docs.withColumn("_u", hash_uniform(F.col(id_col), seed))
           .withColumn("split", expr).drop("_u"))
    return out.where(F.col("split").isNotNull())


# --------------------------------------------------------------------------
# Length-bucketed batching (padding-waste accounting)
# --------------------------------------------------------------------------

def length_buckets(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Assign each doc the power-of-2 padded length that length-bucketed
    batching would pad it to, and account the waste.

    Batching variable-length sequences pads every doc in a batch to the
    bucket cap; bucketing by next-pow-2 bounds the waste at < 50% per
    doc while keeping the bucket count logarithmic (~30 buckets no
    matter the corpus size — a bounded aggregation key at 100 TB).
    Returns per-doc (doc_id, n_tok, bucket, pad) with
    bucket = 2^ceil(log2(n_tok)) and pad = bucket - n_tok; zero-token
    docs are dropped (nothing to batch). Pure map-side expression —
    the caller aggregates by `bucket` for the padding-waste report.

    Cross-engine note: log2 is exact on powers of two in IEEE double,
    so the ceil never straddles a bucket boundary on either engine.
    """
    bucket = F.pow(F.lit(2.0),
                   F.ceil(F.log2(F.col("n_tok").cast("double")))) \
        .cast("long")
    return (docs.select(F.col(id_col),
                        token_len(F.col(text_col)).alias("n_tok"))
            .where(F.col("n_tok") > 0)
            .withColumn("bucket", F.greatest(bucket, F.lit(1).cast("long")))
            .withColumn("pad", F.col("bucket") - F.col("n_tok")))


# --------------------------------------------------------------------------
# Domain mixing weights (DoReMi-lite)
# --------------------------------------------------------------------------

def domain_mix_weights(docs: DataFrame, group_col: str = "source",
                       text_col: str = "text") -> DataFrame:
    """Per-domain sampling weights for training-mix construction
    (DoReMi-lite): weight ∝ sqrt(domain token count) × mean quality,
    normalized to sum to 1. The sqrt tempers the head domains (the
    standard alpha=0.5 temperature) and the quality factor demotes
    low-quality sources; the resulting column feeds straight into
    `stratified_sample(docs, rates=...)`.

    Cross-engine determinism: the per-doc quality is fixed-pointed to
    1e-6 BEFORE summing (integer sums are order-independent, double
    sums are not), and every subsequent float op (sqrt, ×, ÷) is
    IEEE correctly-rounded — so the weights are bit-equal across
    Spark and the DuckDB oracle. One hash aggregation on the domain
    key with map-side combine; the ≤|domains| result normalizes via a
    bounded global window.
    """
    from pyspark.sql import Window

    from error_analysis_spark.extensions.text import quality_expr, tokens

    q_fp = F.round(quality_expr(text_col) * 1e6).cast("long")
    per = docs.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col)).cast("long")).alias("n_tokens"),
        F.sum(q_fp).alias("_q_fp"))
    raw_fp = F.round(F.sqrt(F.col("n_tokens").cast("double"))
                     * (F.col("_q_fp").cast("double") / F.col("n_docs"))
                     ).cast("long")
    w = per.withColumn("_raw_fp", raw_fp)
    total = F.sum("_raw_fp").over(Window.partitionBy())
    return (w.select(
        F.col(group_col),
        F.col("n_docs"), F.col("n_tokens"),
        F.round(F.col("_q_fp").cast("double") / F.col("n_docs") / 1e6, 6)
        .alias("mean_quality"),
        F.round(F.col("_raw_fp").cast("double") / total, 6).alias("weight"))
    )


# --------------------------------------------------------------------------
# Weighted per-group sampling without replacement (A-ES)
# --------------------------------------------------------------------------

def weighted_sample_k(docs: DataFrame, k: int, weight_col: str,
                      group_col: str = "source", id_col: str = "doc_id",
                      seed: int = 42) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement of k rows per group
    (Efraimidis–Spirakis A-ES): each row gets key u^(1/w) with u a
    deterministic md5-uniform of its id; the k largest keys per group
    are distributed ∝ weight — "pick the k docs per domain, favoring
    quality" in one pass.

    One shuffle on the group key; the rank window is PARTITIONED by
    group (no global funnel), and the sample is partitioning- and
    order-independent (the key is a pure function of the row id).
    Non-positive weights are excluded (they have zero selection mass).
    Output: input columns + `rn` (1..k selection order).
    """
    u = hash_uniform(F.col(id_col), seed)
    keyed = (docs.where(F.col(weight_col) > 0)
             .withColumn("_aes", F.pow(u, F.lit(1.0) / F.col(weight_col))))
    w = Window.partitionBy(group_col).orderBy(F.col("_aes").desc(),
                                              F.col(id_col))
    return (keyed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("_aes"))
