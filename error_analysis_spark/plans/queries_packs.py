"""Consolidated query packs — rotation-debt control for the driver's
50-query verification window.

The driver oracle-checks only the FIRST 50 declared queries per round,
so a 129-name registry meant each query earned a driver green at best
every ~2.6 rounds. Packs fuse families of single queries into ONE
declared query whose value hash covers every member's full result:

- same-grain members (per-doc tables keyed by doc_id, per-cell grids)
  fuse by JOIN — native column types survive, nothing is stringified;
- same-schema members fuse by UNION ALL with a `part` label column;
- heterogeneous members fuse by a typed SLOT union: strings/dates into
  k-slots (int→string and date→string casts are bit-stable across
  engines), integers into n-slots (BIGINT), floats/decimals into
  d-slots (DOUBLE; decimal→double is IEEE round-to-nearest in both
  engines, and the member values already hash-matched as singles).

Every member keeps its standalone function (tests, bench and the
library surface still import them); only the DECLARED registry entry
is the pack. The member→pack map lives in `PACKED_MEMBERS`;
`__spark_entry__` drops packed members from the declared registry.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.plans.queries_core import CORE_QUERIES
from error_analysis_spark.plans.queries_ext import EXT_QUERIES
from error_analysis_spark.plans.queries_misc import MISC_QUERIES
from error_analysis_spark.plans.queries_raster import RASTER_QUERIES
from error_analysis_spark.plans.queries_vario import VARIO_QUERIES

_ALL_SINGLES: dict[str, tuple] = {}
for _d in (CORE_QUERIES, VARIO_QUERIES, RASTER_QUERIES, MISC_QUERIES,
           EXT_QUERIES):
    _ALL_SINGLES.update(_d)

_K_SLOTS, _N_SLOTS, _D_SLOTS = 3, 3, 7


def _slot_df(df: DataFrame, name: str, k=(), n=(), d=()) -> DataFrame:
    cols = [F.lit(name).alias("q")]
    for i in range(_K_SLOTS):
        c = (F.col(k[i]).cast("string") if i < len(k)
             else F.lit(None).cast("string"))
        cols.append(c.alias(f"k{i + 1}"))
    for i in range(_N_SLOTS):
        c = (F.col(n[i]).cast("long") if i < len(n)
             else F.lit(None).cast("long"))
        cols.append(c.alias(f"n{i + 1}"))
    for i in range(_D_SLOTS):
        c = (F.col(d[i]).cast("double") if i < len(d)
             else F.lit(None).cast("double"))
        cols.append(c.alias(f"d{i + 1}"))
    return df.select(*cols)


def _slot_sql(name: str, sql: str, k=(), n=(), d=()) -> str:
    parts = [f"'{name}' AS q"]
    for i in range(_K_SLOTS):
        parts.append(f"CAST({k[i]} AS VARCHAR) AS k{i + 1}" if i < len(k)
                     else f"CAST(NULL AS VARCHAR) AS k{i + 1}")
    for i in range(_N_SLOTS):
        parts.append(f"CAST({n[i]} AS BIGINT) AS n{i + 1}" if i < len(n)
                     else f"CAST(NULL AS BIGINT) AS n{i + 1}")
    for i in range(_D_SLOTS):
        parts.append(f"CAST({d[i]} AS DOUBLE) AS d{i + 1}" if i < len(d)
                     else f"CAST(NULL AS DOUBLE) AS d{i + 1}")
    return ("SELECT " + ",\n       ".join(parts)
            + f"\nFROM (\n{sql}\n) _m_{name}")


def _slot_pack(members: list[tuple]) -> tuple:
    """members: [(member_name, k_cols, n_cols, d_cols)]. Returns the
    (fn, sql) pair for the pack — Spark unionByName of slotted member
    results, SQL UNION ALL of slotted member oracles."""
    def pack_fn(spark: SparkSession, sf_dir: str,
                _members=tuple(members)) -> DataFrame:
        dfs = []
        for name, k, n, d in _members:
            fn, _sql = _ALL_SINGLES[name]
            dfs.append(_slot_df(fn(spark, sf_dir), name, k, n, d))
        return reduce(DataFrame.unionByName, dfs)

    pack_sql = "\nUNION ALL\n".join(
        _slot_sql(name, _ALL_SINGLES[name][1], k, n, d)
        for name, k, n, d in members)
    return pack_fn, pack_sql


# --------------------------------------------------------------------------
# TPC-H shape packs (VERDICT r4 #3): the 22 single-query shapes grouped
# into aggregate / join-chain / subquery families. Each member's FULL
# result lands in the pack (typed slots), so one green row re-verifies
# every shape in the family. Member docstrings/plans unchanged —
# queries_core.py still owns the implementations.
# --------------------------------------------------------------------------

_TPCH_AGG = [
    ("q01_pricing_summary", ("l_returnflag", "l_linestatus"),
     ("count_order",),
     ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
      "avg_qty", "avg_price", "avg_disc")),
    ("q04_priority_exists", ("o_orderpriority",), ("n_orders",), ()),
    ("q06_forecast_revenue", (), ("n_items",), ("revenue",)),
    ("q12_priority_by_lateness", ("ship_class",),
     ("high_line_count", "low_line_count"), ()),
    ("q13_order_distribution", (), ("c_count", "custdist"), ()),
    ("q14_promo_revenue", (), (), ("promo_pct", "total_revenue")),
    ("q22_idle_balance", (), ("c_nationkey", "n_cust"), ("total_bal",)),
]

_TPCH_JOIN = [
    ("q02_first_supplier", ("p_name", "s_name", "first_ship"),
     ("p_partkey", "s_suppkey"), ()),
    ("q03_top_orders", ("o_orderdate",), ("o_orderkey",), ("revenue",)),
    ("q05_region_volume", ("n_name",), (), ("revenue",)),
    ("q07_bination_volume", ("supp_nation", "cust_nation"),
     ("o_year", "n_items"), ("revenue",)),
    ("q08_market_share", (), ("o_year",), ("mkt_share", "total_revenue")),
    ("q09_profit_by_nation_year", ("nation",), ("o_year", "n_items"),
     ("profit",)),
    ("q10_returned_revenue", ("c_name", "n_name"), ("c_custkey",),
     ("revenue", "c_acctbal")),
    ("q19_disjunctive_revenue", (), ("n_items",), ("revenue",)),
]

_TPCH_SUBQ = [
    ("q11_value_concentration", (), ("l_partkey",), ("revenue", "share")),
    ("q15_top_supplier", ("s_name",), ("s_suppkey",), ("total_revenue",)),
    ("q16_supplier_variety", ("p_brand",), ("size_band", "supplier_cnt"),
     ()),
    ("q17_small_qty_revenue", (), ("n_items",), ("avg_yearly",)),
    ("q18_large_orders", ("c_name", "o_orderdate"),
     ("c_custkey", "o_orderkey"), ("o_totalprice", "total_qty")),
    ("q20_dominant_supplier", ("s_name",),
     ("s_suppkey", "n_parts_dominated", "qty_dominated"), ()),
    ("q21_sole_late_supplier", ("s_name",), ("s_suppkey", "numwait"), ()),
]

tpch_agg_pack = _slot_pack(_TPCH_AGG)
tpch_join_pack = _slot_pack(_TPCH_JOIN)
tpch_subq_pack = _slot_pack(_TPCH_SUBQ)


# --------------------------------------------------------------------------
# Same-grain JOIN packs: members share a key and a complete row set, so
# the pack is a column-wise fuse — native types, no slotting.
# --------------------------------------------------------------------------

def _member(name: str):
    return _ALL_SINGLES[name]


def text_doc_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text-analysis profile: repetition signals + PII
    scrub + BPE token counts + unigram perplexity + duplicated-8-gram
    coverage, one row per doc (inner join on doc_id — every member
    covers the full corpus), plus — since round 8 — the trained-BPE
    encode columns (text_bpe_encode: the full Sennrich trainer's rules
    applied row-locally; LEFT join because docs whose every word
    contains a sentinel byte are unencodable and carry NULLs).

    Round 12 (VERDICT r11 #4, guide §1.2 fewer passes): the ROW-LOCAL
    member trio (repetition's per-doc line signal, the PII scrub, the
    BPE token counts) fuses into repetition_stats' projection side via
    `extra_cols` — one documents scan computes all three members'
    columns instead of three scans joined back on doc_id. Every fused
    expression is the member's own operator expression (TX.pii_cols,
    TX.bpe_ish_tokens/TX.tokens, queries_ext._pii_aug_text), so member
    and pack cannot drift; tests/test_round12_opt.py pins the fused
    columns against the standalone member frames, and the members'
    standalone functions are untouched."""
    from error_analysis_spark.extensions import text as TX
    from error_analysis_spark.plans.queries_ext import _pii_aug_text
    from error_analysis_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_email, n_ipv4, n_phone, scrubbed = TX.pii_cols(_pii_aug_text())
    bpe = TX.bpe_ish_tokens(F.col("text"))
    ws = TX.tokens(F.col("text"))
    extra = {
        "n_email": n_email, "n_ipv4": n_ipv4, "n_phone": n_phone,
        "scrub_md5": F.md5(scrubbed),
        "n_bpe_tokens": F.size(bpe), "n_ws_tokens": F.size(ws),
        "fertility": F.round(F.size(bpe) / F.size(ws), 6),
    }
    s = TX.repetition_stats(docs, extra_cols=extra)
    out = s.select(
        "doc_id",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("top_2gram_frac", 6).alias("top_2gram_frac"),
        F.round("dup_5gram_frac", 6).alias("dup_5gram_frac"),
        "n_email", "n_ipv4", "n_phone", "scrub_md5",
        "n_bpe_tokens", "n_ws_tokens", "fertility")
    for m in ("text_perplexity", "text_dup_ngrams"):
        out = out.join(_member(m)[0](spark, sf_dir), "doc_id")
    enc = _member("text_bpe_encode")[0](spark, sf_dir).select(
        "doc_id", F.col("n_words").alias("bpe_enc_words"),
        F.col("n_chars").alias("bpe_enc_chars"),
        F.col("n_tokens").alias("bpe_enc_tokens"),
        F.col("chars_per_token").alias("bpe_enc_cpt"))
    return out.join(enc, ["doc_id"], "left")


TEXT_DOC_PACK_SQL = f"""
WITH _rep AS ({{rep}}), _pii AS ({{pii}}), _bpe AS ({{bpe}}),
     _ppl AS ({{ppl}}), _dng AS ({{dng}}), _enc AS ({{enc}})
SELECT _rep.doc_id, _rep.dup_line_frac, _rep.top_2gram_frac,
       _rep.dup_5gram_frac,
       _pii.n_email, _pii.n_ipv4, _pii.n_phone, _pii.scrub_md5,
       _bpe.n_bpe_tokens, _bpe.n_ws_tokens, _bpe.fertility,
       _ppl.n_tokens, _ppl.cross_entropy, _ppl.perplexity,
       _dng.n_grams, _dng.n_dup, _dng.dup_frac,
       _enc.n_words AS bpe_enc_words, _enc.n_chars AS bpe_enc_chars,
       _enc.n_tokens AS bpe_enc_tokens,
       _enc.chars_per_token AS bpe_enc_cpt
FROM _rep
JOIN _pii USING (doc_id) JOIN _bpe USING (doc_id)
JOIN _ppl USING (doc_id) JOIN _dng USING (doc_id)
LEFT JOIN _enc ON _enc.doc_id = _rep.doc_id
""".format(rep=_member("text_repetition")[1],
           pii=_member("text_pii_scrub")[1],
           bpe=_member("text_token_count_bpe")[1],
           ppl=_member("text_perplexity")[1],
           dng=_member("text_dup_ngrams")[1],
           enc=_member("text_bpe_encode")[1])


def s8_grid_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both S8 gridding methods per cell (full-outer on (row, col):
    max only covers cells holding points, IDW covers the whole grid)."""
    gmax = _member("s8_grid_max")[0](spark, sf_dir)
    gidw = _member("s8_grid_idw")[0](spark, sf_dir)
    return gmax.join(gidw, ["row", "col"], "full_outer")


S8_GRID_PACK_SQL = """
SELECT coalesce(a.row, b.row) AS row, coalesce(a.col, b.col) AS col,
       a.z_max, b.z_idw
FROM ({gmax}) a FULL OUTER JOIN ({gidw}) b
  ON a.row = b.row AND a.col = b.col
""".format(gmax=_member("s8_grid_max")[1], gidw=_member("s8_grid_idw")[1])


def mm_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset multimodal features annotated with the per-kind corpus
    stats (broadcastable 3-row dimension), the perceptual-hash image
    near-dup columns (mm_phash, round 8: 64-bit dHash over the real
    decode path + banded Hamming-radius pair summary; NULL for
    audio/video) and — since round 9 — the audio perceptual near-dup
    columns (mm_afp: 64-bit lag-energy Haitsma–Kalker fingerprint over
    the real WAV decode path + the same banded pair search at radius
    8, folded in per the dedup_sig_pack/mm_phash precedent; NULL for
    image/video).

    Round 11 (optimization, guide §4): the pack's three member decode
    passes (extract_features over every asset, image_phash over the
    image third, audio_fingerprint over the audio third — ~1.67 corpus
    decodes plus three Arrow payload transfers) are fused into ONE
    pinned `fused_asset_fingerprints` pass; the feats / phash / afp
    frames become projections of the shared pin, and the pair searches
    plus `_near_summary` tails run unchanged on top. Per-row semantics
    of every member column are exactly the standalone kernels'
    (tests/test_round11_opt.py pins the equivalence; the standalone
    member functions are untouched)."""
    from pyspark.storagelevel import StorageLevel

    from error_analysis_spark.cachereg import track
    from error_analysis_spark.extensions import multimodal as MM
    from error_analysis_spark.plans.queries_ext import (_doc_assets,
                                                        _near_summary)

    fused = MM.fused_asset_fingerprints(_doc_assets(spark, sf_dir),
                                        batch_rows=32)
    fused = track(fused.persist(StorageLevel.MEMORY_AND_DISK))
    feats = fused.select(
        "asset_id", "kind", "n_bytes",
        F.concat_ws("x", F.col("shape").cast("array<string>")).alias("shape"),
        "decode_src")
    stats = _member("mm_payload_stats")[0](spark, sf_dir)
    ph = fused.where(F.col("kind") == "image").select(
        "asset_id", "phash", "decode_src")
    ph_out = _near_summary(ph, "phash", "ph",
                           MM.phash_near_pairs(ph, max_hamming=6))
    af = fused.where(F.col("kind") == "audio").select(
        "asset_id", "afp", F.col("af_src").alias("decode_src"))
    af_out = _near_summary(af, "afp", "af",
                           MM.afp_near_pairs(af, max_hamming=8))
    return (feats.join(F.broadcast(stats), "kind")
            .join(ph_out, ["asset_id"], "left")
            .join(af_out, ["asset_id"], "left"))


MM_PACK_SQL = """
WITH _f AS ({feats}), _s AS ({stats}), _p AS ({phash}), _a AS ({afp})
SELECT _f.kind, _f.asset_id, _f.n_bytes, _f.shape, _f.decode_src,
       _s.n_assets, _s.total_bytes, _s.n_distinct_payloads, _s.avg_width,
       _p.phash, _p.ph_src, _p.ph_n_near, _p.ph_min_ham, _p.ph_sum_ham,
       _p.ph_nearest,
       _a.afp, _a.af_src, _a.af_n_near, _a.af_min_ham, _a.af_sum_ham,
       _a.af_nearest
FROM _f JOIN _s USING (kind) LEFT JOIN _p USING (asset_id)
LEFT JOIN _a USING (asset_id)
""".format(feats=_member("mm_features")[1],
           stats=_member("mm_payload_stats")[1],
           phash=_member("mm_phash")[1],
           afp=_member("mm_afp")[1])


def dedup_sig_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc hash signatures: the 8-perm MinHash rows joined with the
    SimHash fingerprint (both row-local signature plans) and, since
    round 7, the per-doc summary of the banded Hamming-radius search
    (dedup_simhash_pairs — n_near / min_ham / sum_ham / deterministic
    nearest neighbor; NULL for docs with no neighbor in radius). The
    pack's value hash covers the pair search end-to-end: a missing or
    extra pair flips its endpoints' n_near, and ANY distance change —
    minimal pair or not — flips both endpoints' sum_ham (min_ham alone
    would miss a mis-distanced non-minimal pair). The nearest tie-break
    key is exact wide-integer arithmetic (DECIMAL(38,0) here, HUGEINT
    in the oracle), safe for the full signed-64-bit id domain."""
    sigs = _member("dedup_minhash_sigs")[0](spark, sf_dir)
    # NOT pinned deliberately: the SimHash subtree feeds the pack's
    # simhash column and both band-join sides. In r07 this was a
    # measured trade (recompute 1.72 s vs persist 3.77 s); since the
    # round-8 row-local rewrite the subtree is a ZERO-exchange scan +
    # select, so recomputing 3× is trivially right — there is no
    # shuffle to save (VERDICT r07 #3).
    sim = _member("dedup_simhash")[0](spark, sf_dir)
    pairs = _member("dedup_simhash_pairs")[0](spark, sf_dir)
    sym = (pairs.select(F.col("id_a").alias("id"),
                        F.col("id_b").alias("nbr"), "hamming")
           .unionByName(pairs.select(F.col("id_b").alias("id"),
                                     F.col("id_a").alias("nbr"),
                                     "hamming")))
    # (hamming, nbr) lexicographic order as one exact integer key:
    # hamming * 2^64 + (nbr - INT64_MIN); ids ≥ 2^32 or negative would
    # silently mis-order under a narrower multiplier
    key = (F.col("hamming").cast("decimal(38,0)")
           * F.lit("18446744073709551616").cast("decimal(38,0)")
           + F.col("nbr").cast("decimal(38,0)")
           + F.lit("9223372036854775808").cast("decimal(38,0)"))
    near = sym.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_near"),
        F.min("hamming").cast("int").alias("min_ham"),
        F.sum("hamming").cast("long").alias("sum_ham"),
        F.min_by("nbr", key).alias("nearest"))
    return sigs.join(sim, "id").join(near, ["id"], "left")


DEDUP_SIG_PACK_SQL = """
WITH _m AS ({sigs}), _s AS ({sim}), _p AS ({pairs}),
_sym AS (
  SELECT id_a AS id, id_b AS nbr, hamming FROM _p
  UNION ALL
  SELECT id_b AS id, id_a AS nbr, hamming FROM _p
),
_nn AS (
  SELECT id, CAST(count(*) AS BIGINT) AS n_near,
         CAST(min(hamming) AS INTEGER) AS min_ham,
         CAST(sum(hamming) AS BIGINT) AS sum_ham,
         arg_min(nbr, hamming * 18446744073709551616
                      + (nbr + 9223372036854775808)) AS nearest
  FROM _sym GROUP BY id
)
SELECT _m.id, _m.perm, _m.minhash, _s.simhash,
       _nn.n_near, _nn.min_ham, _nn.sum_ham, _nn.nearest
FROM _m JOIN _s USING (id) LEFT JOIN _nn USING (id)
""".format(sigs=_member("dedup_minhash_sigs")[1],
           sim=_member("dedup_simhash")[1],
           pairs=_member("dedup_simhash_pairs")[1])


def mixing_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing layer in one per-doc table: global training order +
    packed-chunk spans (1:1 per doc) left-joined with the stratified
    sample's per-doc copy count (upsampled docs collapse copy_nr rows
    to n_copies — the rate is what the oracle pins; NULL = not
    sampled)."""
    order = _member("curation_train_order")[0](spark, sf_dir)
    chunks = _member("curation_pack_chunks")[0](spark, sf_dir)
    samp = (_member("curation_sample_mix")[0](spark, sf_dir)
            .groupBy("doc_id", "source", "lang")
            .agg(F.count("*").alias("n_copies")))
    return order.join(chunks, "doc_id").join(samp, ["doc_id"], "left")


MIXING_PACK_SQL = """
WITH _o AS ({order}), _c AS ({chunks}),
_s AS (
  SELECT doc_id, source, lang, CAST(count(*) AS BIGINT) AS n_copies
  FROM ({samp}) _raw GROUP BY doc_id, source, lang
)
SELECT _o.doc_id, _o.position,
       _c.n_tok, _c.start_tok, _c.first_chunk, _c.n_chunks,
       _s.source, _s.lang, _s.n_copies
FROM _o JOIN _c USING (doc_id) LEFT JOIN _s USING (doc_id)
""".format(order=_member("curation_train_order")[1],
           chunks=_member("curation_pack_chunks")[1],
           samp=_member("curation_sample_mix")[1])


def contam_chunk_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking × decontamination: per-chunk rows annotated with
    the parent doc's benchmark-contamination score (full-outer — bench
    docs carry no contamination row, empty docs carry no chunks)."""
    chunks = _member("text_chunk_windows")[0](spark, sf_dir)
    # boolean→int: a NULL boolean renders None/NaN inconsistently
    # across engines' pandas bridges; a nullable BIGINT is stable
    contam = _member("text_contamination")[0](spark, sf_dir) \
        .withColumn("contaminated", F.col("contaminated").cast("long"))
    return chunks.join(contam, ["doc_id"], "full_outer")


CONTAM_CHUNK_PACK_SQL = """
WITH _c AS ({chunks}), _t AS ({contam})
SELECT coalesce(_c.doc_id, _t.doc_id) AS doc_id,
       _c.chunk_idx, _c.chunk_tokens, _c.chunk_hash,
       _t.n_grams, _t.n_matched, _t.contam_frac,
       CAST(_t.contaminated AS BIGINT) AS contaminated
FROM _c FULL OUTER JOIN _t ON _c.doc_id = _t.doc_id
""".format(chunks=_member("text_chunk_windows")[1],
           contam=_member("text_contamination")[1])


# --------------------------------------------------------------------------
# Same-schema UNION packs (label column keeps members separable).
# --------------------------------------------------------------------------

def sigma_a_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three sigma_A estimators in one table: per-zone brute-force
    double sum, per-zone analytical disk integral, and the global
    Hugonnet k-center estimate (zone_id='ALL')."""
    brute = _member("sigma_a_brute")[0](spark, sf_dir) \
        .select(F.lit("brute").alias("method"), "zone_id", "sigma_a")
    zones = _member("sigma_a_zones")[0](spark, sf_dir) \
        .select(F.lit("analytical").alias("method"), "zone_id", "sigma_a")
    hug = _member("sigma_a_hugonnet")[0](spark, sf_dir) \
        .select(F.lit("hugonnet").alias("method"),
                F.lit("ALL").alias("zone_id"), "sigma_a")
    return brute.unionByName(zones).unionByName(hug)


SIGMA_A_PACK_SQL = """
SELECT 'brute' AS method, zone_id, sigma_a FROM ({brute}) _b
UNION ALL
SELECT 'analytical' AS method, zone_id, sigma_a FROM ({zones}) _z
UNION ALL
SELECT 'hugonnet' AS method, 'ALL' AS zone_id, sigma_a FROM ({hug}) _h
""".format(brute=_member("sigma_a_brute")[1],
           zones=_member("sigma_a_zones")[1],
           hug=_member("sigma_a_hugonnet")[1])


def sim_pair_pack_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every pairwise-similarity surface in one (method, id_a, id_b,
    sim, rk) table: exact blocked-GEMM k-NN, LSH-bucketed ANN top-k,
    embedding near-dup pairs, and MinHash-LSH candidate pairs (sim =
    exact-verify Jaccard there)."""
    pw = _member("sim_pairwise_topk")[0](spark, sf_dir).select(
        F.lit("pairwise").alias("method"), "id_a", "id_b", "sim",
        F.col("rk").cast("long").alias("rk"))
    lsh = _member("sim_lsh_topk")[0](spark, sf_dir).select(
        F.lit("lsh").alias("method"), "id_a", "id_b", "sim",
        F.col("rk").cast("long").alias("rk"))
    emb = _member("dedup_embedding")[0](spark, sf_dir).select(
        F.lit("embdup").alias("method"), "id_a", "id_b", "sim",
        F.lit(None).cast("long").alias("rk"))
    mh = _member("dedup_minhash_lsh")[0](spark, sf_dir).select(
        F.lit("mhlsh").alias("method"), "id_a", "id_b",
        F.col("jaccard").alias("sim"), F.lit(None).cast("long").alias("rk"))
    return pw.unionByName(lsh).unionByName(emb).unionByName(mh)


SIM_PAIR_PACK_SQL = """
SELECT 'pairwise' AS method, id_a, id_b, sim, CAST(rk AS BIGINT) AS rk
FROM ({pw}) _p
UNION ALL
SELECT 'lsh' AS method, id_a, id_b, sim, CAST(rk AS BIGINT) AS rk
FROM ({lsh}) _l
UNION ALL
SELECT 'embdup' AS method, id_a, id_b, sim, CAST(NULL AS BIGINT) AS rk
FROM ({emb}) _e
UNION ALL
SELECT 'mhlsh' AS method, id_a, id_b, jaccard AS sim,
       CAST(NULL AS BIGINT) AS rk
FROM ({mh}) _m
""".format(pw=_member("sim_pairwise_topk")[1],
           lsh=_member("sim_lsh_topk")[1],
           emb=_member("dedup_embedding")[1],
           mh=_member("dedup_minhash_lsh")[1])


# --------------------------------------------------------------------------
# Typed-slot packs for heterogeneous small families.
# --------------------------------------------------------------------------

_DEDUP_CLUSTER = [
    ("dedup_exact", ("text_hash",), ("n_copies", "canonical_id"), ()),
    ("dedup_components", (), ("component", "cluster_size", "max_id"), ()),
    ("dedup_incremental", ("status",), ("doc_id", "match_id"), ()),
]

_TEXT_SKETCH = [
    ("sketch_kmv_distinct", ("event_type",), ("n_kept",),
     ("est_distinct",)),
    ("text_vocab_topk", ("token",), ("tf", "df"), ()),
    ("text_lang_id", ("pred_lang",), ("n_docs",), ("sum_score_en",)),
]

_EMB_PACK = [
    ("emb_quantize_stats", ("vec_id",),
     ("code_sum", "code_checksum", "n_sat"), ("scale", "mse")),
    ("emb_label_centroids", ("label",), ("dim", "n_vecs"), ("mean_val",)),
    # round 8: product-quantization ANN — topk rows (rank, id,
    # exact_dist, adc) + the per-(block, code) assignment histogram
    # (count, distortion), all hash-visible through the slots
    ("emb_pq_topk", ("part",), ("i", "j", "m"), ("v",)),
]

_TEMPORAL = [
    ("w4_sessionize", (),
     ("user_id", "session_start_us", "session_end_us"),
     ("n_events", "sum_value")),
    ("j10_asof_join", (), ("user_id", "probe_id", "probe_ts_us"),
     ("asof_ts_us", "asof_value", "lag_us")),
]

dedup_cluster_pack = _slot_pack(_DEDUP_CLUSTER)
text_sketch_pack = _slot_pack(_TEXT_SKETCH)
emb_pack = _slot_pack(_EMB_PACK)
temporal_pack = _slot_pack(_TEMPORAL)


PACK_QUERIES: dict[str, tuple] = {
    "tpch_agg_pack": tpch_agg_pack,
    "tpch_join_pack": tpch_join_pack,
    "tpch_subq_pack": tpch_subq_pack,
    "text_doc_pack": (text_doc_pack_fn, TEXT_DOC_PACK_SQL),
    "s8_grid_pack": (s8_grid_pack_fn, S8_GRID_PACK_SQL),
    "mm_pack": (mm_pack_fn, MM_PACK_SQL),
    "dedup_sig_pack": (dedup_sig_pack_fn, DEDUP_SIG_PACK_SQL),
    "mixing_pack": (mixing_pack_fn, MIXING_PACK_SQL),
    "contam_chunk_pack": (contam_chunk_pack_fn, CONTAM_CHUNK_PACK_SQL),
    "sigma_a_pack": (sigma_a_pack_fn, SIGMA_A_PACK_SQL),
    "sim_pair_pack": (sim_pair_pack_fn, SIM_PAIR_PACK_SQL),
    "dedup_cluster_pack": dedup_cluster_pack,
    "text_sketch_pack": text_sketch_pack,
    "emb_pack": emb_pack,
    "temporal_pack": temporal_pack,
}

# member → pack (declared-registry replacement map)
_ROSTERS: dict[str, list] = {
    "tpch_agg_pack": [m[0] for m in _TPCH_AGG],
    "tpch_join_pack": [m[0] for m in _TPCH_JOIN],
    "tpch_subq_pack": [m[0] for m in _TPCH_SUBQ],
    "text_doc_pack": ["text_repetition", "text_pii_scrub",
                      "text_token_count_bpe", "text_perplexity",
                      "text_dup_ngrams", "text_bpe_encode"],
    "s8_grid_pack": ["s8_grid_max", "s8_grid_idw"],
    "mm_pack": ["mm_features", "mm_payload_stats", "mm_phash", "mm_afp"],
    "dedup_sig_pack": ["dedup_minhash_sigs", "dedup_simhash",
                       "dedup_simhash_pairs"],
    "mixing_pack": ["curation_train_order", "curation_pack_chunks",
                    "curation_sample_mix"],
    "contam_chunk_pack": ["text_chunk_windows", "text_contamination"],
    "sigma_a_pack": ["sigma_a_brute", "sigma_a_zones",
                     "sigma_a_hugonnet"],
    "sim_pair_pack": ["sim_pairwise_topk", "sim_lsh_topk",
                      "dedup_embedding", "dedup_minhash_lsh"],
    "dedup_cluster_pack": [m[0] for m in _DEDUP_CLUSTER],
    "text_sketch_pack": [m[0] for m in _TEXT_SKETCH],
    "emb_pack": [m[0] for m in _EMB_PACK],
    "temporal_pack": [m[0] for m in _TEMPORAL],
}
PACKED_MEMBERS: dict[str, str] = {
    m: pack for pack, roster in _ROSTERS.items() for m in roster}
