"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
COMPACT JSON line as the FINAL stdout line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {<headline subset>}, "sf": ..., "turns_per_sec": ...,
     "n_queries": ..., "load_avg_start": ..., "full_timings": "BENCH/..."}

The full per-query timing map (110+ entries) goes to
``BENCH/last_run_sf<sf>.json`` — NOT into the stdout line: r4's line carried
all 117 entries, overflowed the driver's tail-capture window, and the round
recorded ``parsed: null`` (VERDICT r4 #2).  The compact line keeps the
driver contract keys plus a fixed ~dozen-query headline subset.

The headline is extraction throughput (turns/sec) — measured on a
deterministic synthetic transcript table large enough to dominate fixed
overheads — plus the per-operator timings of the dedup / similarity /
text-analysis suite over the sf-dir tables.  Scaling-efficiency evidence
(local[8] vs local[32]) is produced by ``bench/scaling.py`` →
``BENCH/BASELINE.md``; this file stays single-config for the driver.

Machine-noise discipline (CLAUDE.md): 1-min load average is sampled at
start and end and recorded; a loud start (> LOAD_WARN, default 2.0) prints
a warning line to STDERR so a contaminated run is never mistaken for a
regression again.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
VOLUME_TURNS = int(os.environ.get("SPARKX_BENCH_TURNS", 1_600_000))
LOAD_WARN = float(os.environ.get("SPARKX_BENCH_LOAD_WARN", 2.0))
REPO = os.path.dirname(os.path.abspath(__file__))

# the fixed compact-line subset: the extraction headline + one representative
# per operator family (dedup / cluster / ANN / lexical / curation / graph /
# text-analysis / funnel) — small enough that the driver's tail-capture
# window can never truncate the JSON line again
HEADLINE_QUERIES = [
    "ext_fastpath_volume", "ext_agentic_volume",
    "dedup_minhash_lsh", "dedup_clusters",
    "ann_topk", "ann_ivf", "ann_ivf_probe", "ann_pq_probe",
    "ann_ivfpq_probe", "ann_bm25",
    "cur_dsir", "corpus_funnel_gopher",
    "html_pagerank", "ta_gopher_rules", "ta_top_tokens",
]


def _count(df) -> int:
    return df.count()


def _force_count(df) -> int:
    """count() that cannot be column-pruned past expensive branches.

    A bare count() lets Catalyst prune every aggregate expression the
    count doesn't reference — for an op shaped `base LEFT JOIN (pairs
    groupBy agg)` (semdedup, embed-decontam) that prunes the ENTIRE pair
    branch and the bench would time a no-op (caught live in r5: semdedup
    at 1M vectors "ran" 4.2G pairs in 2.3 s).  Aggregating a hash of
    every column forces full evaluation while staying driver-cheap."""
    from pyspark.sql import functions as F

    df.agg(F.max(F.xxhash64(F.struct(*df.columns)))).collect()
    return df.count()


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from sparkx.pipeline import extract_blocks, surviving
    from sparkx.session import build_session
    from sparkx.synth import synth_spark

    load_start = round(os.getloadavg()[0], 2)
    if load_start > LOAD_WARN:
        print(
            f"WARNING: 1-min load average {load_start} > {LOAD_WARN} at bench "
            f"start — co-tenant noise will inflate walls (CLAUDE.md: never "
            f"bench while another Spark job or pytest is alive)",
            file=sys.stderr,
        )
    spark = build_session("sparkx-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=2 * CPUS)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # ── headline: extraction throughput on a deterministic synthetic table,
    #    production-shaped (parquet scan → extract → count) ──────────────────
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    vol_path = f"{base}/sparkx_bench_input_{VOLUME_TURNS}"
    if not os.path.isdir(vol_path):
        synth_spark(spark, n_convs=VOLUME_TURNS // 100, turns_per_conv=100,
                    n_partitions=2 * CPUS).write.mode("overwrite").parquet(vol_path)
    transcripts = spark.read.parquet(vol_path)
    # volume queries run the 100-TB configuration (emit_raw=False: the raw
    # text is consumed by Checkpoint-A inside the kernel, not duplicated into
    # the output — the input table already holds it); correctness suites keep
    # emit_raw=True to byte-compare raw_content.  Measured ~20% of the wall.
    _count(surviving(extract_blocks(transcripts)))  # warm pass (python workers)
    n_surv = timed(
        "ext_fastpath_volume",
        lambda: _count(
            surviving(extract_blocks(transcripts, mode="fastpath", emit_raw=False))
        ),
    )
    timed(
        "ext_agentic_volume",
        lambda: _count(
            surviving(
                extract_blocks(
                    transcripts, mode="agentic", validate=True, emit_raw=False
                )
            )
        ),
    )
    extras["volume_turns"] = VOLUME_TURNS
    extras["volume_surviving_blocks"] = n_surv
    extras["turns_per_sec"] = round(VOLUME_TURNS / timings["ext_fastpath_volume"], 1)

    # ── operator suite over the sf-dir tables ────────────────────────────
    qs = E.queries()
    suite = [
        "ext_text_blocks", "ext_table_markdown", "ext_agentic_tables",
        "ext_chunk_stats", "ext_crossref",
        "ta_profile", "ta_lang_agg",
        # NB: dedup_ngram_jaccard (exact all-pairs) and dedup_embedding
        # (brute-force) are the *verification* paths — quadratic by design —
        # and stay out of the timed suite; their LSH scale-paths are timed.
        "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_embedding_lsh",
        "ann_topk", "ann_topk_lsh",
        "w2_topk_per_group", "j2_dedup_merge", "p6_safe_json",
        "mm_decode", "mm_frame_sample",
        # r2 additions: corpus curation + answer-phase skeletons
        "cur_sample", "cur_filter", "tb_rollup", "quantiles_by_lang",
        "cur_distinct_stats", "cur_pack",
        "ta_scrub", "ta_repetition",
        "s7_answer_trunc", "u5_answer_validation", "p11_prompt_build",
        # r3 additions: cluster resolution, batch kNN join, A5 stats
        "dedup_clusters", "ann_knn_join", "a5_query_stats",
        "ta_token_counts", "fp_winnow", "fp_winnow_overlap",
        "dedup_embedding_clusters",
        # r4 additions: lexical retrieval, contamination audit, IVF ANN
        # (r5: the ann_ivf query is now the FROZEN-quantizer path — inline
        # assignment map + probe + exact scoring; the one-time k-means fit is
        # timed separately as ann_ivf_build below, and the pruned prebuilt-
        # index probe as ann_ivf_probe — VERDICT r4 #6), incremental-batch
        # kNN (dedup_recall_report stays untimed — it embeds the uncapped
        # exact ngram_jaccard_pairs ground truth, quadratic verification
        # path, same rationale as dedup_ngram_jaccard)
        "ann_bm25", "fp_contamination", "ann_ivf", "ann_knn_batch",
        "cur_mixture", "corpus_cube", "cur_chunks",
        "dedup_incremental", "cur_split",
        # r4 late additions: hybrid RRF fusion, Gopher rule battery,
        # cross-doc shingle redundancy
        "ann_rrf", "ta_gopher_rules", "dedup_shared_ngrams",
        "cur_scorecard", "corpus_funnel_gopher", "funnel_steps",
        "ta_unigram_logprob", "cohort_retention",
        # r4: HTML boilerplate strip (density rule + corpus-frequency rule)
        "html_main_content", "html_freq_boiler",
        # r4: hyperlink graph + integer-grid PageRank / HITS
        "html_links", "html_pagerank", "html_hits",
        # r4: source-priority exact dedup (struct-min canonical pick)
        "dedup_priority",
        # r4: temperature-balanced multilingual sampling (mT5 alpha=0.5)
        "cur_temperature",
        # r4: weighted sampling w/o replacement + DSIR domain affinity
        "cur_priority", "cur_dsir",
        # r4: capped-epochs mixture allocation + keyless time-range join
        "cur_epochs", "range_join_events",
        # r4: exact top-k frequent tokens (Misra-Gries candidates + recount)
        "ta_top_tokens",
        # stream_attribution stays untimed like stream_extract/stream_dedup:
        # its wall is streaming-rig setup (workspace + checkpoint init +
        # micro-batch scheduling), not operator cost
        # r4 continuation: decontamination semi-join, char entropy, bigram
        # LM, CCNet perplexity tiers, single-scan profiler, URL-canonical
        # dedup, hub-subgraph link components
        "cur_decontaminate", "ta_entropy", "ta_bigram_logprob",
        "cur_ccnet_buckets", "profile_columns", "dedup_url",
        "html_components",
        # CCNet line-level dedup with document reassembly
        "dedup_lines",
        # leakage-safe cluster-atomic split (LSH pairs -> CC -> hash gate)
        "cur_cluster_split",
        # per-registered-domain health rollup
        "host_scorecard",
        # per-doc top-k TF-IDF keywords
        "ta_tfidf_keywords",
        # n-gram novelty curve; exact-k stratified sample
        "dedup_novelty", "cur_fixed_k",
        # r4 close: shard-writer assignment, recrawl snapshot diff,
        # int8-quantized ANN top-k (dedup_containment stays untimed: the
        # driver query pins max_shingle_df=None for the exact oracle, the
        # quadratic verification path — same rationale as
        # dedup_ngram_jaccard; the capped scale path is pytest-covered)
        "cur_shards", "cur_snapshot_diff", "ann_int8_topk",
        # incremental distinct stats: per-batch HLL sketches + binary merge
        "cur_hll_batches",
        # token-length PSI drift between snapshots
        "cur_drift",
        # embedding-table QA gate (NULL/NaN/zero-norm/outlier/ragged)
        "ann_health",
        # quality-aware near-dup cluster canonical (LSH pairs -> CC -> argmax)
        "dedup_quality_canonical",
        # int8-vs-fp32 recall@10 fidelity report
        "ann_int8_recall",
        # r5: product-quantization ADC top-k (inline encode + probe; the
        # prebuilt-codes serve path is timed as ann_pq_probe below) and the
        # IVF-PQ composite (cell-pruned probe over compressed codes; the
        # partitioned prebuilt layout is timed as ann_ivfpq_probe below)
        "ann_pq", "ann_ivfpq", "ann_pq_recall",
        # r5: transcript freq-boilerplate strip (CCNet rule, turn axis)
        # and tool-chain transition mining
        "cur_turn_boiler", "cur_tool_chains",
        # r5 continuation: IVF-vs-exact recall fidelity, transcript
        # stuck-loop detection, FastSS deletion-blocked editdist pairs
        "ann_ivf_recall", "cur_conv_loops", "dedup_editdist",
        # r5: manifest prune simulation + Heaps-law vocab growth
        "diag_prune_report", "ta_vocab_growth",
        # r5: chat-format well-formedness QA (SFT pre-template checks)
        "cur_role_qa",
        # r5 session: DPO best-of-n pair harvest, chat-template loss-mask
        # offsets, nDCG/MRR ranking fidelity of the int8 serving path, and
        # the Zipf-slope corpus-shape diagnostic
        "cur_dpo_pairs", "cur_sft_render", "ann_ndcg", "ta_zipf_fit",
        # r5 session: packing fill-rate / straddle report
        "cur_pack_eff",
        # r5 close: data-constrained epoch schedule + MMR context re-rank
        "cur_epoch_repeats", "ann_mmr",
        # r5 close: gap-based session segmentation + code-vs-prose routing
        "cur_session_splits", "ta_code_flags",
        # r5 final: adjacent-turn merge, conversation branch collapse,
        # split-leakage audit, readability router, lexical diversity
        "cur_turn_merge", "dedup_branches", "cur_split_leakage",
        "ta_readability", "ta_ttr",
        # r5 final batch 2: filtered ANN, global training order,
        # encoding-damage detector, detector-consensus audit
        "ann_filtered_topk", "cur_global_order", "ta_mojibake",
        "dedup_consensus",
        # r5 final batch 3: Gopher rule ablation, per-source dup scorecard,
        # token-budget mixture planner
        "ta_rule_ablation", "cur_dup_by_source", "cur_mix_plan",
        # r5 final batch 4: proportional source interleaving
        "cur_interleave",
        # r5 final batch 5: SemDeDup (cell-bounded embedding dedup) +
        # semantic decontamination (broadcast eval set)
        "dedup_semdedup", "cur_embed_decontam",
        # r5 final batch 5c: broadcast centroid-table assignment
        "ann_assign_table",
        # r5 final batch 5d: mutual top-k pairs (checkpointed self-join —
        # count() forces it: the join output IS the expensive part)
        "ann_mutual_knn",
        # r5 batch 6: per-tool invocation timing, shared-prefix collapse,
        # context-budget truncation audit, recall-vs-nprobe curve,
        # dedup threshold sweep
        "cur_tool_latency", "dedup_prefix", "cur_budget_truncate",
        "ann_probe_curve", "dedup_threshold_sweep",
        # r5 batch 7: tokenizer fertility, compliance markers,
        # dehyphenation repair
        "ta_fertility", "ta_compliance", "ta_dehyphenate",
        # r5 batch 8: quality-scorer calibration vs the Gopher battery,
        # scan-parallelism advisor, acquisition capacity planner,
        # head-metadata extraction
        "ta_calibration", "diag_scan_parallelism", "cur_crawl_plan",
        "html_meta",
        # r5 batch 9: agent outcome labeling, conversation-level dedup,
        # language-consistency audit
        "cur_agent_outcomes", "dedup_convs", "cur_lang_mix",
        # r5 batch 10: adjacent-turn echo audit, context-fit sweep
        "cur_turn_echo", "cur_context_fit",
    ]
    # ops whose expensive branch feeds ONLY columns a bare count() prunes
    # (left-joined aggregates; budget_truncate's window + latency/prefix agg
    # expressions prune the same way) — must force evaluation or the timing
    # is a no-op (see _force_count).  The batch-7/8 map-only ops are forced
    # too: a bare count() prunes their flag/repair/ratio expressions down
    # to a scan floor (~0.17 s at sf0.1).  Pre-batch-6 map-only entries
    # keep the historical bare-count convention so their ledger deltas stay
    # comparable across rounds.
    FORCE = {"dedup_semdedup", "cur_embed_decontam", "ann_assign_table",
             "cur_tool_latency", "dedup_prefix", "cur_budget_truncate",
             "ta_fertility", "ta_compliance", "ta_dehyphenate",
             "ta_calibration", "diag_scan_parallelism", "cur_crawl_plan",
             "html_meta", "cur_agent_outcomes", "dedup_convs",
             "cur_lang_mix", "cur_turn_echo", "cur_context_fit"}
    for name in suite:
        fn = _force_count if name in FORCE else _count
        timed(name, lambda n=name, f=fn: f(qs[n](spark, SF_DIR)))

    # the scale-default sketch paths (mergeable approx_percentile / HLL++) —
    # quantiles_by_lang / cur_distinct_stats above time the exact oracle-gate
    # modes
    from sparkx.ops.corpus import distinct_stats, token_quantiles_by

    timed(
        "quantiles_sketch",
        lambda: _count(
            token_quantiles_by(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"), by="lang"
            )
        ),
    )
    timed(
        "distinct_sketch",
        lambda: _count(
            distinct_stats(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"), by="lang"
            )
        ),
    )
    # the CAPPED scale path of the substring-span detector — the driver
    # query dedup_repeated_spans pins the cap to None for its exact oracle
    # (same split as quantiles/distinct above: gate-exact vs scale-default)
    from sparkx.ops.dedup import cut_repeated_spans, repeated_span_pairs

    timed(
        "repeated_spans_capped",
        lambda: _count(
            repeated_span_pairs(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                n=5, min_span_tokens=15, max_shingle_df=1000,
            )
        ),
    )
    timed(
        "cut_spans_capped",
        lambda: _count(
            cut_repeated_spans(
                spark.read.parquet(f"{SF_DIR}/documents.parquet"),
                n=5, min_span_tokens=15, max_shingle_df=1000,
            )
        ),
    )

    # ── IVF index-build / probe split (VERDICT r4 #6): the k-means fit is a
    # one-time INDEX BUILD — time it apart from the query path; then write
    # the frozen-quantizer assignment partitionBy(ivf_cell) (the production
    # layout) and time the probe alone on the prebuilt index, where the
    # broadcast probe-cell semi-join prunes the scan to nprobe/n_cells ─────
    from sparkx.ops.similarity import (
        ivf_assign,
        ivf_assign_frozen,
        ivf_topk_frozen,
        load_frozen_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    timed(
        "ann_ivf_build",
        lambda: ivf_assign(emb, n_centroids=8, seed=7)[0].count(),
    )
    cents = load_frozen_centroids()
    ivf_path = f"{base}/sparkx_bench_ivf_index_sf{sf}"
    ivf_assign_frozen(emb, cents).write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(ivf_path)
    prebuilt = spark.read.parquet(ivf_path)
    timed(
        "ann_ivf_probe",
        lambda: _count(
            ivf_topk_frozen(
                emb, cents, query_vec_id=0, k=10, nprobe=2, assigned=prebuilt
            )
        ),
    )

    # ── PQ encode / probe split (same rationale as IVF build/probe): the
    # code table is written ONCE (the production resident-code layout);
    # the serve path pays only the code scan + broadcast LUT join ─────────
    from sparkx.ops.similarity import (
        load_frozen_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    books = load_frozen_pq_codebooks()
    pq_path = f"{base}/sparkx_bench_pq_codes_sf{sf}"
    timed(
        "ann_pq_encode",
        lambda: pq_encode(emb.filter(F.col("embedding").isNotNull()), books)
        .select("vec_id", "label", "pq_codes")
        .write.mode("overwrite").parquet(pq_path),
    )
    pq_codes = spark.read.parquet(pq_path)
    timed(
        "ann_pq_probe",
        lambda: _count(
            pq_topk(emb, books, query_vec_id=0, k=10, encoded=pq_codes)
        ),
    )
    # IVF-PQ production layout: cell-partitioned code table; the probe
    # reads ~nprobe/n_cells of the files AND scores only m-int codes
    from sparkx.ops.similarity import ivfpq_topk

    ivfpq_path = f"{base}/sparkx_bench_ivfpq_codes_sf{sf}"
    pq_encode(ivf_assign_frozen(emb, cents), books).filter(
        F.col("pq_codes").isNotNull()
    ).select("vec_id", "label", "ivf_cell", "pq_codes").write.mode(
        "overwrite"
    ).partitionBy("ivf_cell").parquet(ivfpq_path)
    ivfpq_codes = spark.read.parquet(ivfpq_path)
    timed(
        "ann_ivfpq_probe",
        lambda: _count(
            ivfpq_topk(emb, cents, books, query_vec_id=0, k=10, nprobe=2,
                       assigned_codes=ivfpq_codes)
        ),
    )

    total = round(sum(timings.values()), 3)
    load_end = round(os.getloadavg()[0], 2)
    full = {
        "metric": "extraction+ops suite wall time (headline: turns/sec extraction throughput)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **extras,
        "cpus": CPUS,
        "load_avg_start": load_start,
        "load_avg_end": load_end,
    }
    full_path = os.path.join("BENCH", f"last_run_sf{sf}.json")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, full_path), "w") as f:
        json.dump(full, f, indent=1)
    # the COMPACT driver line — final stdout line, fixed small size
    print(
        json.dumps(
            {
                "metric": full["metric"],
                "value": total,
                "unit": "sec",
                "queries": {
                    k: timings[k] for k in HEADLINE_QUERIES if k in timings
                },
                "sf": full["sf"],
                "turns_per_sec": extras["turns_per_sec"],
                "volume_turns": VOLUME_TURNS,
                "cpus": CPUS,
                "n_queries": len(timings),
                "load_avg_start": load_start,
                "load_avg_end": load_end,
                "full_timings": full_path,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
