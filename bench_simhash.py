"""SimHash Hamming-radius pair-search scale probe — linearity +
planted-recall evidence for `dedup.simhash_near_pairs` (pigeonhole
banding, no all-pairs join).

Corpus: wide-vocabulary docs (24 md5-derived tokens). One planted
exact-duplicate partner per 50 docs (Hamming distance 0 — MUST be
found; exactness within the radius is separately test-asserted against
brute force in tests/test_round7_ops.py, so the probe's job is recall
of the planted set + wall-clock shape). Doubling the corpus must
~double wall: band fan-out is row-local and the candidate join is
bucketed by (band, band_bits).

    SPARK_GRAFT_SIMHASH_DOCS=100000,200000 python bench_simhash.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import dedup as DD
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SIMHASH_DOCS", "100000,200000").split(",")]
    spark = get_spark("bench-simhash")
    results = []
    tok = (lambda s, j: F.substring(
        F.md5(F.concat(s.cast("string"), F.lit("_"), j.cast("string"))),
        1, 10))
    for n in sizes:
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        dups = (spark.range(0, n, 50)
                .select((F.col("id") + 10_000_000).alias("doc_id")))
        rel = F.when(F.col("doc_id") >= 10_000_000,
                     F.col("doc_id") - 10_000_000).otherwise(F.col("doc_id"))
        text = F.array_join(F.transform(
            F.sequence(F.lit(0), F.lit(23)), lambda j: tok(rel, j)), " ")
        corpus = (base.unionByName(dups)
                  .select("doc_id", text.alias("text"))
                  .repartition(64).cache())
        corpus.count()
        t0 = time.perf_counter()
        pairs = DD.simhash_near_pairs(corpus, bits=48, max_hamming=3) \
            .cache()
        n_pairs = pairs.count()
        planted_found = pairs.where(
            (F.col("id_b") - F.col("id_a") == 10_000_000)
            & (F.col("hamming") == 0)).count()
        dt = round(time.perf_counter() - t0, 1)
        pairs.unpersist()
        corpus.unpersist()
        results.append({"docs": n + (n + 49) // 50, "sec": dt,
                        "pairs": n_pairs,
                        "planted_found": planted_found,
                        "planted": (n + 49) // 50})
    print(json.dumps({"metric": "simhash_pairs_probe", "runs": results}))
    banded_probe(spark)
    spark.stop()


def banded_probe(spark) -> None:
    """Round-8 deep probe (VERDICT r07 #8): the banding search itself
    at up to 500k signatures and the WIDER radii k=4-5, with planted
    near-dups at EXACT Hamming 1-3 (partner = base XOR d random bits —
    signature-level planting, so the distance is controlled, unlike
    token perturbation) and the candidate:verified ratio measured on
    the operator's own candidate stage (`_band_candidates` — same
    plan, pre-verify).

    The probe's first finding (round 8): the CLASSIC m=k+1 banding is
    density-bounded — at k=5 on 48 bits the band is 8 bits wide, so
    500k random signatures put ~2k in every bucket and the candidate
    join exceeds 10⁹ rows (it blew a 30-min budget). The m > k+1
    composite-key probing restores tractability at the same EXACT
    semantics; the configs below pair each radius with the key width
    that keeps candidates sub-quadratic, and the classic config is
    kept ONLY at k=3 (where 12-bit bands are still sparse enough) as
    the baseline.

    Recall of every planted pair must be 1.0 at any k ≥ 3: the
    pigeonhole is exact, so this probes correctness-at-scale, not
    luck.

        SPARK_GRAFT_SIMHASH_SIGS=250000,500000 python bench_simhash.py
    """
    import time as _t

    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import dedup as DD

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SIMHASH_SIGS", "250000,500000").split(",")]
    # (k, m): classic baseline at k=3, composite keys beyond.
    # key widths: k=3,m=4 → 12 bits; k=3,m=6 → 24; k=4,m=8 → 24;
    # k=5,m=8 → 18.
    configs = [(3, None), (3, 6), (4, 8), (5, 8)]
    out = []
    for n in sizes:
        # base: 48-bit signatures from xxhash64 (deterministic);
        # every 50th id gets a partner at Hamming d = 1 + (id/50) % 3
        base = spark.range(n).select(
            F.col("id"),
            (F.xxhash64(F.col("id").cast("string"))
             .bitwiseAND(F.lit((1 << 48) - 1))).alias("sig"))
        flip = None
        for b in range(3):
            # bit position of the (b+1)-th flip: md5-derived, < 48
            pos = (F.conv(F.substring(F.md5(F.concat(
                F.col("id").cast("string"), F.lit(f"_f{b}"))), 1, 7),
                16, 10).cast("long") % 48).cast("int")
            m = F.when(F.lit(b) < 1 + (F.col("id") / 50 % 3).cast("int"),
                       F.expr(f"shiftleft(1L, _p{b})")) \
                 .otherwise(F.lit(0).cast("long"))
            base = base.withColumn(f"_p{b}", pos)
            flip = m if flip is None else flip.bitwiseOR(m)
        partners = (base.where(F.col("id") % 50 == 0)
                    .select((F.col("id") + 10_000_000).alias("id"),
                            F.col("sig").bitwiseXOR(flip).alias("sig")))
        # XOR of possibly-colliding flip masks can plant d' < d — the
        # planted-pair check below counts pairs the radius must catch
        # either way, so collisions only soften the plant, never
        # break exactness
        sigs = (base.select("id", "sig").unionByName(partners)
                .repartition(64).cache())
        sigs.count()
        for k, m in configs:
            t0 = _t.perf_counter()
            n_cand = DD._band_candidates(
                sigs, "sig", bits=48, max_hamming=k, n_bands=m).count()
            pairs = DD.hamming_near_pairs(
                sigs, "sig", bits=48, max_hamming=k, n_bands=m).cache()
            n_pairs = pairs.count()
            dt = round(_t.perf_counter() - t0, 1)
            planted = (pairs.where(F.col("id_b") - F.col("id_a")
                                   == 10_000_000).count())
            pairs.unpersist()
            out.append({"sigs": n + (n + 49) // 50, "k": k,
                        "m": m or k + 1, "sec": dt,
                        "candidates": n_cand, "verified": n_pairs,
                        "cand_per_verified":
                            round(n_cand / max(n_pairs, 1), 1),
                        "planted_found": planted,
                        "planted": (n + 49) // 50})
            print(json.dumps(out[-1]))
        sigs.unpersist()
    print(json.dumps({"metric": "simhash_banded_probe", "runs": out}))


if __name__ == "__main__":
    main()
