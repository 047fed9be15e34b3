#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes its full plan into the noop sink (no driver collect),
so the timing covers scan → shuffle → compute, not result transfer.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the
per-query MIN, so round-over-round deltas are plan signal rather than
machine-load noise (runs_sec carries every raw run for auditing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: the scale-relevant operators (one per family).
HEADLINE = [
    "q1_pricing_summary",        # scan + hash agg
    "broadcast_lookup_join",     # broadcast join chain
    "semi_join_present",         # shuffled semi join
    "geo_containment_join",      # broadcast theta join + collect_list
    "ranking_window_bodc",       # window function
    "sequence_timeseries",       # generator explode
    "tumbling_window_hourly",    # time-window agg
    "session_windows",           # session windows
    "dedup_exact",               # digest agg
    "dedup_pipeline_pairs_xxhash",  # xxhash64 minhash + LSH + Jaccard confirm (production hash family; md5 variant stays oracle-paired)
    "dedup_simhash",             # token explode + 16 bit-sums
    "dedup_ngram_jaccard",       # inverted-index join
    "text_langid",               # array intersections
    "text_quality_score",        # scalar expressions
    "text_fingerprint",          # sort+hash + window
    "similarity_topk_bruteforce",  # cosine ranking
    "similarity_ivf_topk",       # IVF assign + probe
    "multimodal_decode_features",  # mapInPandas feature extraction
    "asof_join_events",          # union+window as-of join
    "q5_supplier_volume",        # 6-table join chain
    "gsw_sound_speed",           # codegen polynomial throughput
    # round-2 families:
    "decontaminate_benchmark_overlap",  # broadcast shingle-set overlap
    "interval_bin_join",         # binned range join
    "lm_unigram_logprob",        # broadcast-vocab LM scoring
    # round-3 families:
    "pack_chunks_fixed",         # concat-and-chunk packing (1 window shuffle)
    "text_tfidf",                # broadcast-df TF-IDF
    "dedup_cross_snapshot",      # NEW x PRIOR LSH + digest membership
    # round-4 families:
    "gsw_rho_ct_native",         # 75-term TEOS-10 polynomial codegen throughput
    "q7_volume_shipping",        # 6-table broadcast-dim join + year agg
    "q21_waiting_supplier",      # stacked semi+anti join against the same fact
    "embedding_centroid_distance",  # integer-exact centroid agg + row-local distance
    "text_bigram_repetition",    # row-local bigram stats (zero shuffle)
    "window_lag_lead_delta",     # single-pass lag/lead window
    "cluster_zorder_key",        # 32-term Morton interleave codegen throughput
    "graph_triangle_count",      # ordered two-hop join (compact-forward)
    "dedup_semantic_clusters",   # cell x band-bucket semantic dedup (SemDeDup shape)
    "similarity_lsh_topk",       # hyperplane-LSH bucket-probe ANN
    "embedding_random_projection",  # zero-shuffle JL matmul codegen throughput
    # round-5 families (activated slate):
    "dedup_bbit_minhash",        # shared LSH chain + 1-bit signature confirm
    "dedup_fingerprint_winnowing",  # winnowing window-min fingerprints
    "graph_pagerank_iterations",  # iterative joins (unrolled) on the co-purchase graph
    "gsw_rho_at_pressure",       # EOS-80 secant-bulk-modulus codegen throughput
    "interval_sweepline_backlog",  # explode+window sweep line
    "embedding_binary_signature",  # packed-64bit Hamming multi-index
    "bucketed_colocated_join",   # zero-Exchange bucketed fact-dim join
    # round-6 families (activated slate):
    "q9_product_type_profit",    # profit join chain (part-name slice + orderkey shuffle)
    "similarity_pq_adc_topk",    # PQ asymmetric-distance LUT scoring
    "sketch_hll_merge_daily",    # mergeable HLL sketch roll-up
    "lineitem_corr_matrix",      # one-pass exact integer corr matrix
    "text_duplicate_ngram_fraction",  # row-local dup-ngram profile
    "asof_join_forward",         # forward as-of (union+window)
    # round-8 families:
    "gsw_dynamic_enthalpy",      # staged-Horner 75-term integral (janino-cliff fix landed r8)
    "pareto_revenue_share",      # two-pass range-bucket global ranking (no scan-sized global window)
    "customer_gini_by_nation",   # grouped two-pass ranking (hot-group splitting)
    # round-9 families (global-window migration landed r9):
    "doc_dup_rate_by_length",    # ntile_two_pass deciles x exact-digest dup flag
    "part_abc_xyz_matrix",       # two-pass ABC cumshare x exact-CV XYZ classes
    "part_price_size_skyline",   # distinct-price rollup + two-pass running extreme
    # round-10 families (staged_r10 activation):
    "events_kruskal_wallis_value",  # weighted two-pass midranks (k-sample rank test)
    "text_bm25_topk",            # query-term-filtered posting list + broadcast stats
    "dedup_sorted_neighborhood",  # sort-key blocking dedup (window-adjacent pairs)
]


def main() -> None:
    from cioos_siooc_data_transform_spark.plans import all_queries
    from cioos_siooc_data_transform_spark.session import get_spark

    spark = get_spark("cioos-siooc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warm-up on a trivial action so q1 isn't charged for it.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Host-speed calibration canary (round-7 verdict item 4): a fixed
    # constant-size, in-memory, CPU-bound aggregate touching no repo
    # code and no disk — pure codegen arithmetic over spark.range. Read
    # round-over-round deltas as total/calibration RATIOS: rounds 2 and
    # 7 both "regressed" ~30-40% uniformly across unrelated plan shapes
    # and were adjudicated (after expensive audits) as container speed,
    # not regressions; the canary makes that self-normalizing.
    calib_secs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(1_500_000_000).selectExpr(
            "sum(sin(id * 1e-6) * cos(id * 1e-7)) AS s",
            "sum(id % 1000) AS m",
        ).collect()
        calib_secs.append(round(time.time() - t0, 3))
    calibration = min(calib_secs)

    # Second canary, SHUFFLE-bound (round-10 addition): the round-10
    # re-measure showed the arithmetic canary under-normalizes
    # arithmetic-DENSE queries under CPU throttling (zorder/JL/PQ moved
    # 1.3-1.6x canary-normalized while shuffle-bound queries tracked the
    # canary). A fixed-size repartition+agg canary separates the two
    # failure modes: CPU throttle moves BOTH canaries together; a
    # shuffle/IO problem (disk, spill, network at cluster scale) moves
    # only this one.
    shuffle_secs = []
    for _ in range(3):
        t0 = time.time()
        spark.range(30_000_000).selectExpr(
            "id", "id % 1000000 AS k", "CAST(id % 97 AS DOUBLE) AS v"
        ).repartition(64, "k").groupBy("k").agg(
            {"v": "sum", "id": "max"}
        ).selectExpr("sum(`sum(v)`)", "max(`max(id)`)").collect()
        shuffle_secs.append(round(time.time() - t0, 3))
    shuffle_calibration = min(shuffle_secs)

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # Round-14 (verdict item 8): record the plan-CONSTRUCTION seconds of
    # each timed run separately, so §7.3 construction-floor wins and
    # plan/execution wins are separable round over round. The timed span
    # is UNCHANGED (t0 before construction, stop after the noop sink
    # finishes); this only captures one extra timestamp between the two
    # phases inside the same span.
    cons: dict[str, list[float]] = {name: [] for name in HEADLINE}
    # Measurement-hygiene fix (round 13, documented in
    # OPTIMIZATION_r13.md with the pre-fix numbers kept): collect
    # Python garbage BETWEEN timed regions. Plan construction churns
    # ~100k temporary Column/DataFrame wrappers per pass; their py4j
    # finalizers and the growing gen-2 heap otherwise fire DURING a
    # later query's timed region, so query N's seconds included GC debt
    # created by queries 1..N-1 (measured: a 60-query warm construction
    # pass costs 28.8 s with auto-GC landing mid-timing vs 14.2 s with
    # inter-query collection — same work, different attribution). The
    # timed span itself is unchanged: plan construction + full noop-sink
    # execution from the parquet inputs.
    import gc

    for _ in range(n_runs):
        for name in HEADLINE:
            fn = queries[name]
            gc.collect()
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t_built = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 3))
            cons[name].append(round(t_built - t0, 3))

    # Sub-second queries sit near the scheduler's noise floor, where
    # min-of-2 flaps +/-40% round to round (round-5 verdict: the
    # embedding_centroid_distance 0.50->0.70s "drift" was exactly
    # this). Give anything under 1s enough samples (5 total) that the
    # min is a stable floor; the extra passes are cheap by definition.
    sub_second = [n for n in HEADLINE if min(runs[n]) < 1.0]
    while sub_second and min(len(runs[n]) for n in sub_second) < 5:
        for name in sub_second:
            gc.collect()
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            t_built = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 3))
            cons[name].append(round(t_built - t0, 3))

    timings = {name: min(ts) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    # Pair each query's construction split with the SAME run that won
    # min(total), so queries[name] - construction_sec[name] is a real
    # execution time, not a mix of two different runs.
    construction = {
        name: cons[name][ts.index(min(ts))] for name, ts in runs.items()
    }

    # IOS whole-file ingest vertical (binaryFile scan -> mapInPandas
    # parse): files/s over a 5k-file synthetic corpus, the number
    # comparable with the reference's serial converter (BASELINE.md
    # ~0.19 files/s single-core). Corpus is generated once and cached
    # under spark-warehouse/ (tools/ios_bench_corpus.py); min-of-2.
    ios_ingest = None
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.ios_bench_corpus import ensure_corpus

        from cioos_siooc_data_transform_spark.sources.ios_source import (
            discover_files,
            parse_ios,
        )

        corpus_dir = ensure_corpus()
        n_files = len(
            [f for f in os.listdir(corpus_dir) if f.endswith(".ctd")]
        )
        ingest_secs = []
        for _ in range(2):
            gc.collect()
            t0 = time.time()
            parse_ios(discover_files(spark, corpus_dir, ["ctd"])).write.format(
                "noop"
            ).mode("overwrite").save()
            ingest_secs.append(round(time.time() - t0, 3))
        best = min(ingest_secs)
        ios_ingest = {
            "files": n_files,
            "sec": best,
            "files_per_sec": round(n_files / best, 1),
        }
    except Exception as exc:  # keep the headline line alive regardless
        ios_ingest = {"error": str(exc)[:200]}

    # 50k-file ingest variant (round-7 verdict item 8): the 5k corpus
    # parses in ~2 s, so its files/s is mostly parser; a 10x file count
    # stresses the driver listing + task-scheduling overheads that
    # dominate real many-small-file ingest. Corpus cached the same way
    # (one-time generation under spark-warehouse/); min-of-2.
    ios_ingest_50k = None
    try:
        from tools.ios_bench_corpus import ensure_corpus as _ensure

        from cioos_siooc_data_transform_spark.sources.ios_source import (
            discover_files as _disc,
            parse_ios as _parse,
        )

        corpus_50k = _ensure(n_files=50_000)
        n_50k = len([f for f in os.listdir(corpus_50k) if f.endswith(".ctd")])
        secs_50k = []
        for _ in range(2):
            gc.collect()
            t0 = time.time()
            _parse(_disc(spark, corpus_50k, ["ctd"])).write.format(
                "noop"
            ).mode("overwrite").save()
            secs_50k.append(round(time.time() - t0, 3))
        best_50k = min(secs_50k)
        ios_ingest_50k = {
            "files": n_50k,
            "sec": best_50k,
            "files_per_sec": round(n_50k / best_50k, 1),
        }
    except Exception as exc:  # keep the headline line alive regardless
        ios_ingest_50k = {"error": str(exc)[:200]}

    # Trained semantic-dedup vertical (round-6 verdict item 7): the
    # PRODUCTION SemDeDup path — KMeans-trained centroids feeding the
    # same guarded cell x band-bucket operator the registered
    # fixed-centroid twin benches. Operator-level (not a registry query:
    # the fresh-name budget is reserved for oracle-paired queries);
    # min-of-2, includes the bounded-sample training passes.
    sem_trained = None
    try:
        from pyspark.sql import functions as F  # noqa: PLC0415

        from cioos_siooc_data_transform_spark.operators.dedup import (
            semantic_dedup_trained,
        )
        from cioos_siooc_data_transform_spark.plans.dedup_queries import (
            _EMB_BANDS,
            _EMB_BUCKET_CAP,
            _EMB_HP,
            _SEM_TAU,
        )
        from cioos_siooc_data_transform_spark.session import read_table

        emb = read_table(spark, SF_DIR, "embeddings")
        trained_secs = []
        for _ in range(2):
            gc.collect()
            t0 = time.time()
            # overcap="medoid" is the round-13 production config
            # (SCALE.md round 13: mean-hub recall 0.85 on the LOOSE
            # over-cap stress cluster where round-12's star measured
            # 0.0, and 1.0 on the tight XL mega-cluster with the
            # survivor guarantee); at sf0.1 no bucket exceeds the cap,
            # so results are identical to drop/star and the vertical
            # tracks the production plan's cost (the sidecar's
            # overcap_buckets count below pins that invariant).
            semantic_dedup_trained(
                emb,
                id_col="vec_id",
                vec_col="embedding",
                n_cells=16,
                hyperplanes=_EMB_HP,
                bands=_EMB_BANDS,
                bucket_cap=_EMB_BUCKET_CAP,
                tau=_SEM_TAU,
                overcap="medoid",
            ).write.format("noop").mode("overwrite").save()
            trained_secs.append(round(time.time() - t0, 3))
        sem_trained = {"sec": min(trained_secs)}
        # Over-cap invariant audit (round-12 advice, OUTSIDE the timed
        # loop): the vertical's star==drop claim rests on no bucket
        # exceeding the cap at this SF — record the actual over-cap
        # bucket count in the sidecar so data/cap drift that silently
        # changes what this vertical measures becomes visible. Uses the
        # operator's own bucket assembly (semantic_bucket_counts) with
        # the same seeded training, not a re-derived approximation.
        from cioos_siooc_data_transform_spark.operators.dedup import (
            semantic_bucket_counts,
        )
        from cioos_siooc_data_transform_spark.operators.similarity import (
            train_ivf_centroids,
        )

        cent = train_ivf_centroids(
            emb, id_col="vec_id", vec_col="embedding", n_cells=16, seed=42
        )
        sem_trained["overcap_buckets"] = (
            semantic_bucket_counts(
                emb, cent, id_col="vec_id", vec_col="embedding",
                hyperplanes=_EMB_HP, bands=_EMB_BANDS,
            )
            .filter(F.col("_n") > _EMB_BUCKET_CAP)
            .select("bucket")
            .distinct()
            .count()
        )
    except Exception as exc:  # keep the headline line alive regardless
        sem_trained = {"error": str(exc)[:200]}

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Raw per-run samples go to a side file, NOT the printed line: the
    # driver captures a bounded tail of stdout, and round 4's line (38
    # queries x n_runs raw samples inline) outgrew that window, leaving
    # BENCH_r04.json with parsed=null. Keep the printed line compact.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "tools", "bench_runs_last.json"),
            "w",
        ) as fh:
            json.dump(
                {
                    "runs_sec": runs,
                    "construction_runs_sec": cons,
                    "n_runs": n_runs,
                    "calibration_runs_sec": calib_secs,
                    "shuffle_calibration_runs_sec": shuffle_secs,
                    "ios_ingest": ios_ingest,
                    "ios_ingest_50k": ios_ingest_50k,
                    "semantic_dedup_trained": sem_trained,
                    "sf": sf_val,
                },
                fh,
            )
    except OSError:
        pass
    # The driver captures only the last ~2000 chars of stdout and
    # parses the final JSON line out of that window (BENCH_r08.json
    # recorded parsed=null because the one fat line outgrew it). So:
    # the verbose sections print on their own EARLIER line (also in
    # tools/bench_runs_last.json), and the final line carries only the
    # contract fields — metric/value/unit/queries/sf — with per-query
    # seconds at 2 dp. A size guard drops to 1 dp if the headline set
    # ever pushes the line past the capture window.
    print(
        json.dumps(
            {
                "detail": "bench_sidecar",
                "n_runs": n_runs,
                # Round-14 (verdict item 8): per-query plan-CONSTRUCTION
                # seconds of the best run, so §7.3 construction wins and
                # plan/execution wins are separable. Execution time for a
                # query = queries[name] - construction_sec[name].
                "construction_sec": {
                    k: round(v, 3) for k, v in construction.items()
                },
                "calibration_sec": calibration,
                "shuffle_calibration_sec": shuffle_calibration,
                "total_over_calibration": round(total / calibration, 2),
                "ios_ingest": ios_ingest,
                "ios_ingest_50k": ios_ingest_50k,
                "semantic_dedup_trained": sem_trained,
            }
        )
    )
    # Round-10 verdict item 6: both canaries ride the FINAL line (the
    # driver-visible artifact), not just the sidecar — two short float
    # fields, well inside the 1900-B capture guard.
    for dp in (2, 1):
        line = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {k: round(v, dp) for k, v in timings.items()},
                "sf": sf_val,
                "calibration": round(calibration, 3),
                "shuffle_calibration": round(shuffle_calibration, 3),
            },
            separators=(",", ":"),  # compact: the 60-query dict + two
            # canaries must fit the driver's ~2000-char stdout capture
        )
        if len(line) <= 1900:
            break
    if len(line) > 1900:
        # Terminal guard: even 1-dp rendering outgrew the driver's
        # ~2000-char stdout capture (headline set grew?). Dropping the
        # per-query dict keeps the contract fields parseable — a
        # truncated line would record parsed=null for the whole round.
        # Per-query seconds survive in tools/bench_runs_last.json.
        print(json.dumps({"warning": "bench final line exceeded 1900B "
                          "at 1dp; per-query dict dropped (see "
                          "tools/bench_runs_last.json)"}))
        line = json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 2),
                "unit": "sec",
                "queries": {},
                "sf": sf_val,
                "calibration": round(calibration, 3),
                "shuffle_calibration": round(shuffle_calibration, 3),
            },
            separators=(",", ":"),
        )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
