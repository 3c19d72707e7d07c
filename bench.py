"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "turns_per_sec": ..., ...}

The headline is extraction throughput (turns/sec) — measured on a
deterministic synthetic transcript table large enough to dominate fixed
overheads — plus the per-operator timings of the dedup / similarity /
text-analysis suite over the sf-dir tables.  Scaling-efficiency evidence
(local[8] vs local[32]) is produced by ``bench/scaling.py`` →
``BENCH/BASELINE.md``; this file stays single-config for the driver.
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


def _count(df) -> int:
    return df.count()


def main() -> int:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from sparkx.pipeline import extract_blocks, surviving
    from sparkx.session import build_session
    from sparkx.synth import synth_spark

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
        # r4 additions: lexical retrieval, contamination audit, IVF ANN,
        # incremental-batch kNN (dedup_recall_report stays untimed — it
        # embeds the uncapped exact ngram_jaccard_pairs ground truth,
        # quadratic verification path, same rationale as dedup_ngram_jaccard)
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
    ]
    for name in suite:
        timed(name, lambda n=name: _count(qs[n](spark, SF_DIR)))

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

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "extraction+ops suite wall time (headline: turns/sec extraction throughput)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **extras,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
