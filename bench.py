#!/usr/bin/env python
"""Benchmark harness for the ragflow_ray engine.

Prints ONE JSON line:
    {"metric": "extract_sec", "value": <headline seconds>, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
     "docs_per_sec": ...}

Headline = flagship extraction (synthetic interleaved corpus sized to
the sf, every template, heavy-tail skew handled by page-range
splitting).  ``--scaling`` reruns the headline in fresh processes at
num_cpus=4 and num_cpus=16 on the same input (median of 3, with a
same-window hardware-ceiling calibration) and reports throughput at
both plus the scaling efficiency.

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# synthetic corpus size scales with the sf documents table
_SF_TO_DOCS = {"sf0.001": 400, "sf0.01": 4000, "sf0.1": 16000}


def _corpus_docs() -> int:
    tag = os.path.basename(os.path.normpath(SF_DIR))
    return _SF_TO_DOCS.get(tag, 1200)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data as rd

    from ragflow_ray.chunkers import ChunkConfig
    from ragflow_ray.pipelines.flagship import corpus_dataset
    from ragflow_ray.stages.extract import extract_parquet

    n_docs = _corpus_docs()
    # corpus is materialized to disk ONCE (untimed) and shared by every
    # parallelism level — the timed pipeline is read → extract → count,
    # the shape a production run has
    tag = os.path.basename(os.path.normpath(SF_DIR))
    corpus_dir = f"/tmp/graft_bench_corpus/{tag}-{n_docs}"
    if not os.path.isdir(os.path.join(corpus_dir, "light")):
        log(f"preparing cost-partitioned corpus at {corpus_dir} (untimed)")
        from ragflow_ray.stages.extract import HEAVY_PAGE_THRESHOLD

        ds = corpus_dataset(n_docs, heavy_tail=0.01).materialize()
        ds.filter(
            expr=f"n_media <= {HEAVY_PAGE_THRESHOLD}"
        ).write_parquet(os.path.join(corpus_dir, "light"))
        ds.filter(
            expr=f"n_media > {HEAVY_PAGE_THRESHOLD}"
        ).write_parquet(os.path.join(corpus_dir, "heavy"))

    # stateless task pool: extraction state is module-level (compiled
    # regexes); Ray reuses warm worker processes across tasks. Pre-import
    # the library in EVERY worker so the timed run never pays a cold
    # import (one blocking no-op task per CPU).
    import ray as _ray

    @_ray.remote(num_cpus=1)
    def _warm_worker():
        import ragflow_ray.chunkers  # noqa: F401
        import ragflow_ray.stages.extract  # noqa: F401
        return 0

    _ray.get([_warm_worker.remote() for _ in range(NUM_CPUS)])
    from ragflow_ray.stages.extract import extract_dataset

    warm = rd.read_parquet(corpus_dir).limit(32)
    extract_dataset(warm, cfg=ChunkConfig(), batch_size=16).count()

    # min-of-N: this is a shared VM with contended windows (BASELINE's
    # measured noise experiment: same binary 3.7 s idle, 24.5 s
    # contended) — a single sample can masquerade as a regression, so
    # every reported number is the best of N_SAMPLES back-to-back runs
    n_samples = int(os.environ.get("GRAFT_BENCH_SAMPLES", "3"))

    def best_of(fn) -> float:
        best = float("inf")
        for _ in range(n_samples):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    total = 0

    def _extract_once():
        nonlocal total
        out = extract_parquet(corpus_dir, cfg=ChunkConfig(), batch_size=16)
        total = out.count()

    extract_sec = best_of(_extract_once)
    log(f"extract: {n_docs} docs -> {total} rows in {extract_sec:.2f}s "
        f"min-of-{n_samples} ({n_docs / extract_sec:.1f} docs/s)")

    queries = {}
    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        ray.shutdown()
        return {
            "metric": "extract_sec",
            "value": round(extract_sec, 3),
            "unit": "sec",
            "queries": {},
            "sf": os.path.basename(os.path.normpath(SF_DIR)),
            "num_cpus": NUM_CPUS,
            "corpus_docs": n_docs,
            "docs_per_sec": round(n_docs / extract_sec, 2),
        }
    from ragflow_ray.ops import (
        ann,
        cluster,
        curation,
        dedup,
        multimodal,
        relational,
        textstats,
    )
    from ragflow_ray.ops.extract_queries import html_extract_roundtrip

    # sketch/scoring stages are light: a small actor pool amortizes
    # setup without paying 30-actor spin-up for seconds of work
    pool = (2, min(8, max(2, NUM_CPUS // 2)))
    bench_queries = {
        "token_stats": textstats.token_stats,
        "fingerprints": lambda d: textstats.fingerprints(d).to_pandas(),
        "exact_dedup": dedup.exact_dedup,
        "minhash_near_dups": lambda d: dedup.minhash_near_dups(
            d, concurrency=pool).count(),
        "ngram_jaccard_dups": lambda d: dedup.ngram_jaccard_dups(d).count(),
        "simhash_near_dups": lambda d: dedup.simhash_near_dups(
            d, concurrency=pool).count(),
        "ann_topk": lambda d: ann.brute_force_topk(d, concurrency=pool),
        "ann_lsh_topk": lambda d: ann.lsh_topk(d, concurrency=pool),
        "ann_pq_topk": lambda d: ann.pq_topk(d, concurrency=pool),
        "ann_range_search": ann.range_search,
        "pricing_summary": relational.pricing_summary,
        "user_sessions": relational.user_sessions,
        "events_order_asof": relational.events_order_asof,
        "regional_revenue": relational.regional_revenue,
        "events_range_join": relational.events_range_join,
        "events_hourly_uniques": relational.events_hourly_uniques,
        "user_funnel": relational.user_funnel,
        "cohort_retention": relational.cohort_retention,
        "rolling_active_users": relational.rolling_active_users,
        "event_spike_days": relational.event_spike_days,
        "top_docs_per_source": curation.top_docs_per_source,
        "source_length_quantiles": curation.source_length_quantiles,
        "html_extract_roundtrip": lambda d: html_extract_roundtrip(d).count(),
        "repetition_signals": curation.repetition_signals,
        "pack_sequences": curation.pack_sequences,
        "length_quantiles": curation.length_quantiles,
        "dedup_incremental": dedup.dedup_incremental,
        "curate_and_pack": curation.curate_and_pack,
        "passage_dedup": dedup.passage_dedup,
        "segment_dedup_clean": lambda d: dedup.segment_dedup_clean(d).count(),
        "substring_dedup": lambda d: dedup.substring_dedup(d).count(),
        "pii_scrub": lambda d: curation.pii_scrub(d).count(),
        "vocab_topk": textstats.vocab_topk,
        "hll_distinct_tokens": textstats.hll_distinct_tokens,
        "heavy_hitters": textstats.heavy_hitters,
        "bpe_train": textstats.bpe_train,
        "lm_cross_entropy": curation.lm_cross_entropy,
        "media_phash_dedup": lambda d: multimodal.media_phash_dedup(
            d, concurrency=pool),
        # real-codec decode paths (from-scratch PNG / WAV decoders in
        # the actor pool, not the digest stand-in)
        "image_png_pool": lambda d: multimodal.image_png_pool(
            d, concurrency=pool).count(),
        "audio_wav_frames": lambda d: multimodal.audio_wav_frames(
            d, concurrency=pool).count(),
        "image_gif_pool": lambda d: multimodal.image_gif_pool(
            d, concurrency=pool).count(),
        "audio_g711_frames": lambda d: multimodal.audio_g711_frames(
            d, concurrency=pool).count(),
        "video_mjpeg_frames": lambda d: multimodal.video_mjpeg_frames(
            d, concurrency=pool).count(),
        "video_gif_frames": lambda d: multimodal.video_gif_frames(
            d, concurrency=pool).count(),
        "image_bmp_pool": lambda d: multimodal.image_bmp_pool(
            d, concurrency=pool).count(),
        "audio_energy_zcr": lambda d: multimodal.audio_energy_zcr(
            d, concurrency=pool).count(),
        "audio_pitch_lags": lambda d: multimodal.audio_pitch_lags(
            d, concurrency=pool).count(),
        "image_tiff_pool": lambda d: multimodal.image_tiff_pool(
            d, concurrency=pool).count(),
        "image_mixed_pool": lambda d: multimodal.image_mixed_pool(
            d, concurrency=pool).count(),
        "image_ico_pool": lambda d: multimodal.image_ico_pool(
            d, concurrency=pool).count(),
        "tiff_multipage_pool": lambda d: multimodal.tiff_multipage_pool(
            d, concurrency=pool).count(),
        "image_pnm_pool": lambda d: multimodal.image_pnm_pool(
            d, concurrency=pool).count(),
        "image_tga_pool": lambda d: multimodal.image_tga_pool(
            d, concurrency=pool).count(),
        "mixed_phash_dedup": lambda d: multimodal.mixed_phash_dedup(
            d, concurrency=pool),
        "kmeans_clusters": lambda d: cluster.kmeans_clusters(
            d, concurrency=pool),
        "semdedup": lambda d: cluster.semdedup(d, concurrency=pool),
        "raptor_tree": lambda d: cluster.raptor_tree(d, concurrency=pool),
        "dsir_importance": lambda d: curation.dsir_importance(
            d, concurrency=pool),
        "stratified_split": curation.stratified_split,
        "nb_lang_classify": lambda d: curation.nb_lang_classify(
            d, concurrency=pool),
        "tfidf_top_terms": lambda d: textstats.tfidf_top_terms(
            d, concurrency=pool),
        "pmi_collocations": textstats.pmi_collocations,
        "zipf_fit": textstats.zipf_fit,
        "ttr_by_source": textstats.ttr_by_source,
        "ngram_novelty": textstats.ngram_novelty,
        "event_gap_quantiles": relational.event_gap_quantiles,
        "char_entropy": curation.char_entropy,
        "label_coherence": ann.label_coherence,
        "event_transition_matrix": relational.event_transition_matrix,
        "session_length_histogram": relational.session_length_histogram,
        "late_order_priority": relational.late_order_priority,
        "inactive_customers": relational.inactive_customers,
        "forecast_revenue": relational.forecast_revenue,
        "source_dup_rate": dedup.source_dup_rate,
        "label_affinity": ann.label_affinity,
        "hybrid_topk": textstats.hybrid_topk,
        "gopher_quality_flags": curation.gopher_quality_flags,
        "gopher_repetition_flags": curation.gopher_repetition_flags,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "c4_line_filter": curation.c4_line_filter,
        "winnow_fingerprints": lambda d: len(dedup.winnow_fingerprints(d)),
        "winnow_overlap_pairs": lambda d: len(dedup.winnow_overlap_pairs(d)),
        "length_rank_cdf": lambda d: textstats.length_rank_cdf(d).count(),
        "embedding_covariance": cluster.embedding_covariance,
        "daily_revenue_ma7": relational.daily_revenue_ma7,
        "shipping_priority": relational.shipping_priority,
        "event_trend": relational.event_trend,
        "source_vocab_jaccard": textstats.source_vocab_jaccard,
        "source_js_divergence": textstats.source_js_divergence,
        "levenshtein_near_dups": lambda d: len(
            dedup.levenshtein_near_dups(d)),
        "top_supplier": relational.top_supplier,
        "returned_item_revenue": relational.returned_item_revenue,
        "small_qty_revenue": relational.small_qty_revenue,
        "market_share": relational.market_share,
        "customer_rfm": lambda d: len(relational.customer_rfm(d)),
        "split_leakage": dedup.split_leakage,
        "ann_recall": lambda d: ann.ann_recall(d, concurrency=pool),
        "late_events": relational.late_events,
        "volume_shipping": relational.volume_shipping,
        "nation_part_revenue": relational.nation_part_revenue,
        "promo_revenue_share": relational.promo_revenue_share,
        "customer_order_distribution":
            relational.customer_order_distribution,
        "large_volume_customers": relational.large_volume_customers,
        "disjunctive_revenue": relational.disjunctive_revenue,
        "min_cost_supplier": relational.min_cost_supplier,
        "part_value_share": relational.part_value_share,
        "delay_bucket_priority": relational.delay_bucket_priority,
        "supplier_count_by_part": relational.supplier_count_by_part,
        "dominant_part_suppliers": relational.dominant_part_suppliers,
        "sole_late_suppliers": relational.sole_late_suppliers,
        "idle_customer_balance": relational.idle_customer_balance,
    }
    for name, fn in bench_queries.items():
        try:
            queries[name] = round(best_of(lambda: fn(SF_DIR)), 3)
        except Exception as exc:  # noqa: BLE001
            log(f"query {name} failed: {exc}")
            queries[name] = -1.0
        log(f"query {name}: {queries[name]}s (min of {n_samples})")

    ray.shutdown()
    return {
        "metric": "extract_sec",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "corpus_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_sec, 2),
    }


def _burn(_):
    s = 0
    for i in range(2_000_000):
        s += i * i
    return s


def hw_ceiling(lo: int, hi: int, tasks: int = 64) -> float:
    """The machine's own lo→hi process-scaling ratio measured with a
    pure-CPU burn (no Ray).  On this shared VM, CPU delivery
    fluctuates; sampling the ceiling in the same window as the engine
    runs lets efficiency be reported against what the hardware
    actually offered."""
    import time
    from concurrent.futures import ProcessPoolExecutor

    def tput(workers: int) -> float:
        t0 = time.time()
        with ProcessPoolExecutor(workers) as ex:
            list(ex.map(_burn, range(tasks)))
        return tasks / (time.time() - t0)

    t_lo, t_hi = tput(lo), tput(hi)
    return (t_hi / t_lo) / (hi / lo)


def run_scaling() -> None:
    """Same job, fresh processes, two parallelism levels (N vs 4N CPUs
    standing in for N vs 4N nodes).  Default 4→16 stays within the
    machine's physical cores; 8→32 (override via GRAFT_SCALE_LO/HI)
    crosses into SMT, which caps the hardware ceiling near 0.6.
    Median of ``GRAFT_SCALE_REPS`` runs per level tames short-run
    variance."""
    from statistics import median

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
    # interleave engine runs with hardware-ceiling samples so both see
    # the same contention window
    runs_lo, runs_hi, ceilings = [], [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
        ceilings.append(hw_ceiling(lo, hi))
    tput_lo = median(r["docs_per_sec"] for r in runs_lo)
    tput_hi = median(r["docs_per_sec"] for r in runs_hi)
    eff = tput_hi / (tput_lo * (hi / lo))
    hw = median(ceilings)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "reps": reps,
        "sec_lo": median(r["value"] for r in runs_lo),
        "sec_hi": median(r["value"] for r in runs_hi),
        "docs_per_sec_lo": tput_lo,
        "docs_per_sec_hi": tput_hi,
        "hw_ceiling": round(hw, 3),
        "efficiency_vs_hw": round(min(1.0, eff / hw) if hw > 0 else 0.0, 3),
        "sf": runs_lo[0]["sf"],
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
