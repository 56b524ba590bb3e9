"""Driver contract for the ragflow_ray engine.

The driver calls ``ray.init`` itself before importing this module —
nothing here (or in the library) initializes or shuts down Ray.

* ``entry()``       — flagship extraction over /root/testdata/sf0.001
* ``queries()``     — one callable per implemented operator (SURVEY.md §2
                      + corpus-scale data ops); each takes ``sf_dir``
* ``oracle_sql()``  — DuckDB-equivalent SQL for EVERY query (column
                      names match the Ray results exactly).  Every
                      extraction template is value-hash oracled via a
                      per-template roundtrip
                      (ragflow_ray.ops.template_roundtrips); sketch
                      queries and the pdf-block composition via
                      independent re-derivation fixtures
                      (tools/make_sketch_fixtures.py,
                      tools/make_pdfblocks_fixture.py); the
                      all-templates sweep via a pinned-golden fixture
                      (tools/make_extract_fixtures.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: adapt sf0.001 documents into interleaved span
    rows, extract with the naive template, and also run every template
    over the synthetic corpus; returns the combined output Dataset."""
    from ragflow_ray.chunkers import ChunkConfig
    from ragflow_ray.pipelines.flagship import corpus_from_documents_table
    from ragflow_ray.sources.readers import read_parquet_clean
    from ragflow_ray.stages.extract import extract_dataset

    docs = read_parquet_clean(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    adapted = docs.map_batches(corpus_from_documents_table, batch_format="pyarrow")
    out = extract_dataset(adapted, template="naive", cfg=ChunkConfig(chunk_token_num=128))

    from ragflow_ray.pipelines import flagship_pipeline

    synth = flagship_pipeline(n_docs=180, batch_size=32)
    return out.union(synth)


def queries() -> dict[str, Callable[[str], Any]]:
    from ragflow_ray.ops import (
        ann,
        cluster,
        curation,
        dedup,
        extract_queries,
        multimodal,
        relational,
        template_roundtrips,
        textstats,
        tokenize,
    )

    def media_meta(sf_dir: str):
        df = multimodal.media_features(sf_dir).to_pandas()
        return df[["doc_id", "payload_bytes", "payload_md5"]]

    def media_features_full(sf_dir: str):
        return multimodal.media_features(sf_dir).to_pandas()

    return {
        # --- text analysis (oracled) ---
        "token_stats": textstats.token_stats,
        "quality_scores": lambda d: textstats.quality_scores(d).to_pandas(),
        "lang_id": textstats.lang_id,
        "fingerprints": lambda d: textstats.fingerprints(d).to_pandas(),
        "bm25_lite_topk": textstats.bm25_lite_topk,
        "hybrid_topk": textstats.hybrid_topk,
        "vocab_topk": textstats.vocab_topk,
        "hll_distinct_tokens": textstats.hll_distinct_tokens,
        "heavy_hitters": textstats.heavy_hitters,
        "bpe_pair_counts": textstats.bpe_pair_counts,
        "bpe_train": textstats.bpe_train,
        "lm_cross_entropy": curation.lm_cross_entropy,
        "bpe_encode": textstats.bpe_encode,
        "rag_tokenize": tokenize.rag_tokenize,
        "rag_tokenize_ambiguous": tokenize.rag_tokenize_ambiguous,
        "rag_tokenize_fine": tokenize.rag_tokenize_fine,
        # --- dedup family ---
        "exact_dedup": dedup.exact_dedup,
        "dedup_keepers": dedup.dedup_keepers,
        "token_set_dedup": dedup.token_set_dedup,
        "embedding_near_dups": dedup.embedding_near_dups,
        "minhash_near_dups": lambda d: dedup.minhash_near_dups(d).to_pandas(),
        "ngram_jaccard_dups": lambda d: dedup.ngram_jaccard_dups(d).to_pandas(),
        "simhash_signatures": lambda d: dedup.simhash_signatures(d).to_pandas(),
        "simhash_near_dups": lambda d: dedup.simhash_near_dups(d).to_pandas(),
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_incremental": dedup.dedup_incremental,
        "passage_dedup": dedup.passage_dedup,
        "winnow_fingerprints": dedup.winnow_fingerprints,
        "winnow_overlap_pairs": dedup.winnow_overlap_pairs,
        "levenshtein_near_dups": dedup.levenshtein_near_dups,
        "segment_dedup_clean": lambda d: dedup.segment_dedup_clean(d).to_pandas(),
        "substring_dedup": lambda d: dedup.substring_dedup(d).to_pandas(),
        # --- corpus curation ---
        "decontaminate": curation.decontaminate,
        "stratified_sample": curation.stratified_sample,
        "quality_filter": curation.quality_filter,
        "length_histogram": curation.length_histogram,
        "repetition_signals": curation.repetition_signals,
        "pack_sequences": curation.pack_sequences,
        "training_order": curation.training_order,
        "source_rollup": curation.source_rollup,
        "source_lang_rollup": curation.source_lang_rollup,
        "length_quantiles": curation.length_quantiles,
        "mixture_sample": curation.mixture_sample,
        "temperature_mix": curation.temperature_mix,
        "gopher_quality_flags": curation.gopher_quality_flags,
        "gopher_repetition_flags": curation.gopher_repetition_flags,
        "c4_line_filter": curation.c4_line_filter,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "split_leakage": dedup.split_leakage,
        "curate_and_pack": curation.curate_and_pack,
        "per_source_cap": curation.per_source_cap,
        "top_docs_per_source": curation.top_docs_per_source,
        "source_length_quantiles": curation.source_length_quantiles,
        "pii_scrub": lambda d: curation.pii_scrub(d).to_pandas(),
        "dsir_importance": curation.dsir_importance,
        "nb_lang_classify": curation.nb_lang_classify,
        "stratified_split": curation.stratified_split,
        "tfidf_top_terms": textstats.tfidf_top_terms,
        "pmi_collocations": textstats.pmi_collocations,
        "zipf_fit": textstats.zipf_fit,
        "ttr_by_source": textstats.ttr_by_source,
        "ngram_novelty": textstats.ngram_novelty,
        "char_entropy": curation.char_entropy,
        "length_rank_cdf": textstats.length_rank_cdf,
        "source_vocab_jaccard": textstats.source_vocab_jaccard,
        "source_js_divergence": textstats.source_js_divergence,
        "label_coherence": ann.label_coherence,
        "label_affinity": ann.label_affinity,
        # --- embedding clustering (fixture-oracled iterative k-means) ---
        "kmeans_clusters": cluster.kmeans_clusters,
        "embedding_covariance": cluster.embedding_covariance,
        "semdedup": cluster.semdedup,
        "raptor_tree": cluster.raptor_tree,
        # --- similarity search ---
        "ann_topk": ann.brute_force_topk,
        "ann_ivf_topk": ann.ivf_topk,
        "ann_lsh_topk": ann.lsh_topk,
        "ann_pq_topk": ann.pq_topk,
        "ann_range_search": ann.range_search,
        "ann_recall": ann.ann_recall,
        "label_vector_sums": ann.label_vector_sums,
        # --- multimodal plumbing ---
        "media_meta": media_meta,
        "media_features": media_features_full,
        "media_resize": lambda d: multimodal.media_resize(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "media_frame_sample": lambda d: multimodal.media_frame_sample(d).to_pandas(),
        "media_phash_dedup": multimodal.media_phash_dedup,
        # real-codec paths: actual PNG / WAV containers decoded by the
        # from-scratch decoders inside the actor pool, digest-oracled
        "image_png_pool": lambda d: multimodal.image_png_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "audio_wav_frames": lambda d: multimodal.audio_wav_frames(d).to_pandas(),
        "image_gif_pool": lambda d: multimodal.image_gif_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "audio_g711_frames": lambda d: multimodal.audio_g711_frames(d).to_pandas(),
        "video_mjpeg_frames": lambda d: multimodal.video_mjpeg_frames(d).to_pandas(),
        "video_gif_frames": lambda d: multimodal.video_gif_frames(d).to_pandas(),
        "audio_energy_zcr": lambda d: multimodal.audio_energy_zcr(d).to_pandas(),
        "audio_pitch_lags": lambda d: multimodal.audio_pitch_lags(d).to_pandas(),
        "image_bmp_pool": lambda d: multimodal.image_bmp_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "image_tiff_pool": lambda d: multimodal.image_tiff_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "image_mixed_pool": lambda d: multimodal.image_mixed_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "image_ico_pool": lambda d: multimodal.image_ico_pool(d).to_pandas(),
        "tiff_multipage_pool": lambda d: multimodal.tiff_multipage_pool(d).to_pandas(),
        "image_pnm_pool": lambda d: multimodal.image_pnm_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "image_tga_pool": lambda d: multimodal.image_tga_pool(d).to_pandas()[
            ["doc_id", "out_h", "out_w", "resized_sum"]
        ],
        "mixed_phash_dedup": lambda d: multimodal.mixed_phash_dedup(d),
        # --- relational / streaming-shaped ---
        "pricing_summary": relational.pricing_summary,
        "top_customers": relational.top_customers,
        "event_type_stats": relational.event_type_stats,
        "events_hourly": relational.events_hourly,
        "events_hourly_uniques": relational.events_hourly_uniques,
        "user_funnel": relational.user_funnel,
        "cohort_retention": relational.cohort_retention,
        "rolling_active_users": relational.rolling_active_users,
        "event_spike_days": relational.event_spike_days,
        "event_gap_quantiles": relational.event_gap_quantiles,
        "event_transition_matrix": relational.event_transition_matrix,
        "session_length_histogram": relational.session_length_histogram,
        "late_order_priority": relational.late_order_priority,
        "inactive_customers": relational.inactive_customers,
        "forecast_revenue": relational.forecast_revenue,
        "daily_revenue_ma7": relational.daily_revenue_ma7,
        "event_trend": relational.event_trend,
        "shipping_priority": relational.shipping_priority,
        "top_supplier": relational.top_supplier,
        "returned_item_revenue": relational.returned_item_revenue,
        "small_qty_revenue": relational.small_qty_revenue,
        "market_share": relational.market_share,
        "customer_rfm": relational.customer_rfm,
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
        "source_dup_rate": dedup.source_dup_rate,
        "purchase_attribution": relational.purchase_attribution,
        "user_sessions": relational.user_sessions,
        "events_order_asof": relational.events_order_asof,
        "events_sliding": relational.events_sliding,
        "events_range_join": relational.events_range_join,
        "props_extract_stats": relational.props_extract_stats,
        "nation_customer_counts": relational.nation_customer_counts,
        "regional_revenue": relational.regional_revenue,
        "part_type_stats": relational.part_type_stats,
        # --- pdf text-block assembly (pdf_parser.__call__ path;
        #     value-hash oracled via an independent naive re-derivation
        #     fixture) ---
        "pdf_text_blocks": extract_queries.pdf_text_blocks,
        # --- extraction (roundtrip-oracled) ---
        "txt_chunk_roundtrip": lambda d: extract_queries.txt_chunk_roundtrip(d).to_pandas(),
        "html_extract_roundtrip": lambda d: extract_queries.html_extract_roundtrip(d).to_pandas(),
        # --- per-template roundtrips (value-hash oracled end-to-end) ---
        "extract_naive": template_roundtrips.extract_naive,
        "extract_naive_overflow": template_roundtrips.extract_naive_overflow,
        "extract_book": template_roundtrips.extract_book,
        "extract_book_toc": template_roundtrips.extract_book_toc,
        "extract_qa_roles": template_roundtrips.extract_qa_roles,
        "extract_tag": template_roundtrips.extract_tag,
        "extract_email": template_roundtrips.extract_email,
        "extract_laws": template_roundtrips.extract_laws,
        "extract_paper": template_roundtrips.extract_paper,
        "extract_one": template_roundtrips.extract_one,
        "extract_qa": template_roundtrips.extract_qa,
        "extract_table": template_roundtrips.extract_table,
        "extract_manual": template_roundtrips.extract_manual,
        "extract_presentation": template_roundtrips.extract_presentation,
        # --- all templates over the interleaved payload corpus
        #     (value-hash against a pinned-golden fixture; exercises the
        #     pdf/docx/excel payload formats across all 15 families) ---
        "extract_all_templates": lambda d: extract_queries.corpus_extract(d, None),
    }


# exact 4-gram Jaccard pair predicate, shared by the ngram_jaccard_dups
# and dedup_clusters oracles (must stay bit-identical between them)
_NGRAM_PAIRS_CTE = """base AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            sh AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(ws) < 4
                              THEN [array_to_string(ws, ' ')]
                              ELSE list_distinct(list_transform(range(len(ws) - 3),
                                   i -> ws[i+1] || ' ' || ws[i+2] || ' ' ||
                                        ws[i+3] || ' ' || ws[i+4]))
                              END) AS g
                FROM base
            ),
            counts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            gdf AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 64),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM sh a JOIN gdf ON gdf.g = a.g
                JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
            ),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_both
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            ngram_pairs AS (
                SELECT c.doc_a::BIGINT AS doc_a, c.doc_b::BIGINT AS doc_b,
                       (i.n_both * 10000 // (ca.n + cb.n - i.n_both))::BIGINT
                           AS jaccard_x10000
                FROM cand c
                JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
                JOIN counts ca ON ca.doc_id = c.doc_a
                JOIN counts cb ON cb.doc_id = c.doc_b
                WHERE 2 * i.n_both >= ca.n + cb.n - i.n_both
            )"""

# quality-gate definition imported from the engine so the oracle SQL
# can never drift from the map_batches gates that claim to match it
from ragflow_ray.ops.curation import (  # noqa: E402
    DSIR_BUCKETS as _DSIR_B,
    DSIR_TARGET_LANG as _DSIR_LANG,
    NBC_BUCKETS as _NBC_B,
    NBC_SCALE as _NBC_S,
    PII_EMAIL as _PII_EMAIL,
    PII_IPV4 as _PII_IPV4,
    PII_PHONE as _PII_PHONE,
    QF_MAX_PUNCT_X100 as _QF_MAXPUNCT,
    QF_MIN_TOKENS as _QF_MINTOK,
    QF_PUNCT as _PUNCT,
    QF_STOP_WORDS as _STOP,
    SPLIT_MOD as _SPLIT_MOD,
    SPLIT_TRAIN_LT as _SPLIT_TRAIN,
    SPLIT_VAL_LT as _SPLIT_VAL,
)
# exact ASCII token count — same explicit class as the engine's
# textstats._TOKEN_RUN (trim+split-\s+ diverged on leading/trailing
# whitespace: Python strip() vs SQL trim(); and counted empty text as
# 1 token)
_NTOK = "length(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\v]+'))"
_NTOK_RUN = "[^ \\t\\n\\r\\f\\v]+"
from ragflow_ray.ops.textstats import TFIDF_TOPK as _TFIDF_K  # noqa: E402
from ragflow_ray.ops.textstats import HH_PHI_X1000 as _HH_PHI  # noqa: E402
_NONWS = "length(regexp_replace(text, '[ \\t\\n\\r\\f\\v]', '', 'g'))"
# winnowing fingerprint selection (ops/dedup._winnow_batch mirrored):
# 4-word grams, window-4 min, rightmost tie-break via MAX(position)
_WINNOW_FPS_CTE = """wd AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            wg AS (
                SELECT doc_id, i,
                       CAST(('0x' || substr(md5(array_to_string(
                           list_slice(ws, CAST(i AS INT),
                                      CAST(i + 3 AS INT)), ' ')), 1, 8))
                           AS BIGINT) AS h
                FROM wd, LATERAL (
                    SELECT unnest(range(1, len(ws) - 4 + 2)) AS i) t
            ),
            wmin AS (
                SELECT doc_id, i AS iend,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                                    ROWS BETWEEN 3 PRECEDING
                                             AND CURRENT ROW) AS m
                FROM wg
            ),
            wsel AS (
                SELECT w.doc_id, w.iend, MAX(wg.i) AS jsel
                FROM wmin w JOIN wg
                  ON wg.doc_id = w.doc_id
                 AND wg.i BETWEEN w.iend - 3 AND w.iend
                 AND wg.h = w.m
                WHERE w.iend >= 4
                GROUP BY w.doc_id, w.iend
            ),
            fps AS (
                SELECT DISTINCT s.doc_id, wg.h AS fp
                FROM (SELECT DISTINCT doc_id, jsel FROM wsel) s
                JOIN wg ON wg.doc_id = s.doc_id AND wg.i = s.jsel
            )"""
_TXT_DELIMS = r"[\n!?;。；！？]"
_FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests/fixtures")


def oracle_sql() -> dict[str, str]:
    from ragflow_ray.ops import curation as curation_mod

    oracles = {
        "token_stats": f"""
            SELECT lang,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM({_NTOK})::BIGINT AS n_tokens,
                   SUM(length(text))::BIGINT AS n_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   {_NTOK}::BIGINT AS n_tokens,
                   (length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')))::BIGINT AS n_punct,
                   length(regexp_extract_all(text, '\\b(?:{_STOP})\\b'))::BIGINT AS n_stopwords,
                   (({_NONWS} * 100)
                      // greatest({_NTOK}, 1))::BIGINT AS mean_wordlen_x100
            FROM documents ORDER BY doc_id
        """,
        # integer-quantized BM25-shaped scoring; all-int arithmetic is
        # reproduced exactly (idf_q = (N-df+1)*1e6 // (df+1), score =
        # sum(tf*idf) // (len+50), ties by doc_id)
        "bm25_lite_topk": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            n AS (SELECT COUNT(*) AS n FROM d),
            stats AS (
                SELECT doc_id, len(ws) AS len_d,
                       len(list_filter(ws, x -> x = 'table'))  AS tf_table,
                       len(list_filter(ws, x -> x = 'join'))   AS tf_join,
                       len(list_filter(ws, x -> x = 'vector')) AS tf_vector
                FROM d),
            df AS (SELECT
                       SUM(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END)::BIGINT AS dft,
                       SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)::BIGINT AS dfj,
                       SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END)::BIGINT AS dfv
                   FROM stats),
            scored AS (
                SELECT doc_id,
                       (  tf_table  * ((n.n - df.dft + 1) * 1000000 // (df.dft + 1))
                        + tf_join   * ((n.n - df.dfj + 1) * 1000000 // (df.dfj + 1))
                        + tf_vector * ((n.n - df.dfv + 1) * 1000000 // (df.dfv + 1))
                       ) // (len_d + 50) AS score
                FROM stats, df, n)
            SELECT doc_id::BIGINT AS doc_id, score::BIGINT AS score,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
            FROM scored ORDER BY score DESC, doc_id LIMIT 20
        """,
        # hybrid fusion: integer bm25-lite tk channel + cosine vt
        # channel (rounded 9 dp), hybrid = round(0.3*tk/max(tkmax,1)
        # + 0.7*vt, 6), ranked on the ROUNDED score, ties doc_id asc
        "hybrid_topk": """
            WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            n AS (SELECT COUNT(*) AS n FROM d),
            stats AS (
                SELECT doc_id, len(ws) AS len_d,
                       len(list_filter(ws, x -> x = 'table'))  AS tf_table,
                       len(list_filter(ws, x -> x = 'join'))   AS tf_join,
                       len(list_filter(ws, x -> x = 'vector')) AS tf_vector
                FROM d),
            df AS (SELECT
                       SUM(CASE WHEN tf_table > 0 THEN 1 ELSE 0 END)::BIGINT AS dft,
                       SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)::BIGINT AS dfj,
                       SUM(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END)::BIGINT AS dfv
                   FROM stats),
            tk AS (
                SELECT doc_id,
                       (  tf_table  * ((n.n - df.dft + 1) * 1000000 // (df.dft + 1))
                        + tf_join   * ((n.n - df.dfj + 1) * 1000000 // (df.dfj + 1))
                        + tf_vector * ((n.n - df.dfv + 1) * 1000000 // (df.dfv + 1))
                       ) // (len_d + 50) AS tk_score
                FROM stats, df, n),
            tkmax AS (SELECT GREATEST(MAX(tk_score), 1) AS m FROM tk),
            q AS (SELECT embedding AS qe FROM embeddings ORDER BY vec_id LIMIT 1),
            vt AS (
                SELECT e.vec_id AS doc_id,
                       round(list_cosine_similarity(q.qe::DOUBLE[],
                                                    e.embedding::DOUBLE[]), 9) AS vt_r9
                FROM embeddings e, q),
            scored AS (
                SELECT tk.doc_id, tk_score, vt_r9,
                       round(0.3 * (tk_score / CAST(m AS DOUBLE))
                             + 0.7 * vt_r9, 6) AS hybrid_r6
                FROM tk JOIN vt USING (doc_id), tkmax)
            SELECT doc_id::BIGINT AS doc_id, tk_score::BIGINT AS tk_score,
                   vt_r9, hybrid_r6,
                   ROW_NUMBER() OVER (ORDER BY hybrid_r6 DESC, doc_id)::BIGINT AS rank
            FROM scored ORDER BY hybrid_r6 DESC, doc_id LIMIT 20
        """,
        "lang_id": """
            SELECT CASE WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) * 5
                             > length(text)
                        THEN 'zh' ELSE 'latin' END AS pred_lang,
                   COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_hash,
                   MIN(doc_id)::BIGINT AS keeper_doc_id,
                   COUNT(*)::BIGINT AS n_copies
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "dedup_keepers": """
            SELECT MIN(doc_id)::BIGINT AS doc_id
            FROM documents GROUP BY md5(text) ORDER BY doc_id
        """,
        "label_vector_sums": """
            WITH dims AS (SELECT UNNEST(range(1, 65)) AS d)
            SELECT e.label::BIGINT AS label,
                   (dims.d - 1)::BIGINT AS dim,
                   SUM(CAST(FLOOR(CAST(e.embedding[dims.d] AS DOUBLE) * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_x1e6,
                   COUNT(*)::BIGINT AS n_values
            FROM embeddings e CROSS JOIN dims
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "token_set_dedup": """
            SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS token_set_hash,
                   MIN(doc_id)::BIGINT AS keeper_doc_id,
                   COUNT(*)::BIGINT AS n_members
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # incoming batch (source = src19) vs existing corpus, keyed on
        # the token-set signature (same convention as token_set_dedup)
        "dedup_incremental": """
            SELECT n.doc_id::BIGINT AS doc_id, o.dup_of::BIGINT AS dup_of
            FROM (SELECT doc_id,
                         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
                  FROM documents WHERE source = 'src19') n
            JOIN (SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h,
                         MIN(doc_id) AS dup_of
                  FROM documents WHERE source <> 'src19' GROUP BY 1) o
            USING (h)
            ORDER BY doc_id
        """,
        # per-domain cap: keep 15 docs per source ranked by
        # (md5(text), doc_id) — deterministic unbiased sample
        "per_source_cap": """
            SELECT doc_id::BIGINT AS doc_id, source, rank FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(text), doc_id
                       )::BIGINT AS rank
                FROM documents
            ) WHERE rank <= 15
            ORDER BY source, rank
        """,
        # per-group top-k window: longest 3 docs per source, doc_id
        # tiebreak — classic ROW_NUMBER PARTITION BY
        "top_docs_per_source": """
            SELECT source, rank, doc_id::BIGINT AS doc_id,
                   n_chars::BIGINT AS n_chars
            FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                       )::BIGINT AS rank
                FROM documents
            ) WHERE rank <= 3
            ORDER BY source, rank
        """,
        # grouped exact order statistics: per source, smallest n_chars
        # whose cumulative doc count reaches ceil(p/100 * N_src) —
        # integer arithmetic both sides (same idiom as
        # length_quantiles)
        "source_length_quantiles": """
            WITH n AS (SELECT source, COUNT(*) AS total
                       FROM documents GROUP BY 1),
            c AS (SELECT source, n_chars, COUNT(*) AS cnt
                  FROM documents GROUP BY 1, 2),
            cum AS (SELECT source, n_chars,
                           SUM(cnt) OVER (PARTITION BY source
                                          ORDER BY n_chars) AS cum
                    FROM c)
            SELECT cum.source, p.p_x100::BIGINT AS p_x100,
                   MIN(cum.n_chars)::BIGINT AS n_chars
            FROM (VALUES (50), (90), (99)) AS p(p_x100)
            CROSS JOIN n
            JOIN cum ON cum.source = n.source
                    AND cum.cum >= (p.p_x100 * n.total + 99) // 100
            GROUP BY cum.source, p.p_x100
            ORDER BY cum.source, p.p_x100
        """,
        # passage = consecutive non-overlapping 16-word slice of the
        # split(' ') word list (trailing partial kept; '' = 1 passage);
        # duplicated = md5 occurs >= 2x corpus-wide incl. multiplicity.
        # list_slice is 1-based inclusive and clamps at the list end —
        # exactly Python words[i*16:(i+1)*16]
        # segment = consecutive non-overlapping 10-word slice (same
        # slicing identity as passage_dedup); duplicated = md5 >= 2x
        # corpus-wide incl. multiplicity; clean_text = surviving
        # segments rejoined in order ('' when everything was cut)
        "segment_dedup_clean": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            p AS (
                SELECT doc_id, i,
                       array_to_string(
                           list_slice(ws, i * 10 + 1, (i + 1) * 10), ' ') AS seg,
                       CAST(ceil(len(ws) / 10.0) AS BIGINT) AS n_segs
                FROM (SELECT doc_id, ws,
                             unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
                      FROM base)
            ),
            d AS (SELECT md5(seg) AS h FROM p GROUP BY md5(seg)
                  HAVING COUNT(*) >= 2)
            SELECT doc_id::BIGINT AS doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY i)
                            FILTER (WHERE d.h IS NULL), '') AS clean_text,
                   (COUNT(*) FILTER (WHERE d.h IS NOT NULL))::BIGINT AS n_removed
            FROM p LEFT JOIN d ON md5(p.seg) = d.h
            GROUP BY doc_id ORDER BY doc_id
        """,
        # exact stride-1 substring dedup (Lee et al. 2022): every word
        # covered by a corpus-duplicated 16-word window (any offset,
        # counting multiplicity) is cut; survivors restitch in order
        "substring_dedup": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            win AS (
                SELECT doc_id, i,
                       md5(array_to_string(ws[i+1:i+16], ' ')) AS h
                FROM base, unnest(range(len(ws) - 16 + 1)) AS t(i)
                WHERE len(ws) >= 16
            ),
            dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) >= 2),
            cov AS (
                SELECT DISTINCT w.doc_id, u.j
                FROM win w JOIN dup USING (h),
                     unnest(range(w.i, w.i + 16)) AS u(j)
            ),
            wordidx AS (
                SELECT doc_id, i, ws[i+1] AS w
                FROM base, unnest(range(len(ws))) AS t(i)
            )
            SELECT wi.doc_id,
                   COALESCE(string_agg(CASE WHEN cov.j IS NULL THEN wi.w END,
                                       ' ' ORDER BY wi.i)
                            FILTER (WHERE cov.j IS NULL), '') AS clean_text,
                   COUNT(cov.j)::BIGINT AS n_removed
            FROM wordidx wi
            LEFT JOIN cov ON cov.doc_id = wi.doc_id AND cov.j = wi.i
            GROUP BY wi.doc_id ORDER BY wi.doc_id
        """,
        "passage_dedup": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            p AS (
                SELECT doc_id,
                       md5(array_to_string(
                           list_slice(ws, i * 16 + 1, (i + 1) * 16), ' ')) AS ph,
                       CAST(ceil(len(ws) / 16.0) AS BIGINT) AS n_passages
                FROM (SELECT doc_id, ws,
                             unnest(range(CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS i
                      FROM base)
            ),
            d AS (SELECT ph FROM p GROUP BY ph HAVING COUNT(*) >= 2)
            SELECT doc_id::BIGINT AS doc_id,
                   MAX(n_passages)::BIGINT AS n_passages,
                   COUNT(*)::BIGINT AS n_dup_passages
            FROM p JOIN d USING (ph)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # winnowing (Schleimer et al. 2003): 4-word-gram md5 hashes,
        # window-4 minimum with RIGHTMOST tie-break = MAX(position)
        # over the positions attaining the window MIN; distinct
        # selected hashes per doc (shared CTE _WINNOW_FPS_CTE)
        "winnow_fingerprints": f"""
            WITH {_WINNOW_FPS_CTE}
            SELECT doc_id::BIGINT AS doc_id, fp
            FROM fps ORDER BY doc_id, fp
        """,
        # shared-fingerprint pair counts with the engine's identical
        # 2..64 document-frequency gate on each fingerprint
        "winnow_overlap_pairs": f"""
            WITH {_WINNOW_FPS_CTE},
            gate AS (
                SELECT fp FROM fps GROUP BY fp
                HAVING COUNT(*) BETWEEN 2 AND 64
            ),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       COUNT(*)::BIGINT AS n_shared
                FROM fps a JOIN fps b USING (fp) JOIN gate USING (fp)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
                   n_shared
            FROM p WHERE n_shared >= 2 ORDER BY doc_a, doc_b
        """,
        # byte-level edit distance (DuckDB levenshtein edits UTF-8
        # bytes; the engine diffs the encoded bytes to match) over the
        # winnow candidate pairs, capped at 256 on both sides
        "levenshtein_near_dups": f"""
            WITH {_WINNOW_FPS_CTE},
            gate AS (
                SELECT fp FROM fps GROUP BY fp
                HAVING COUNT(*) BETWEEN 2 AND 64
            ),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       COUNT(*)::BIGINT AS n_shared
                FROM fps a JOIN fps b USING (fp) JOIN gate USING (fp)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.doc_a::BIGINT AS doc_a, p.doc_b::BIGINT AS doc_b,
                   LEAST(levenshtein(da.text, db.text), 256)::BIGINT
                       AS lev_dist
            FROM p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
            WHERE p.n_shared >= 2 ORDER BY doc_a, doc_b
        """,
        # word = split(' ') segment; ties break on the word ascending
        "vocab_topk": """
            SELECT lang, word, n, rank FROM (
                SELECT lang, word, COUNT(*)::BIGINT AS n,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY COUNT(*) DESC, word
                       )::BIGINT AS rank
                FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                GROUP BY lang, word
            ) WHERE rank <= 20
            ORDER BY lang, rank
        """,
        # collocation mining: top-50 adjacent [a-z]+ word pairs by PMI
        # over positional marginals; the (n_ab * N) / (n_l * n_r)
        # operation order and round-6 are pinned on both sides
        "pmi_collocations": """
            WITH w AS (SELECT regexp_extract_all(text, '[a-z]+') AS ws
                       FROM documents),
            b AS (SELECT ws[CAST(i AS INT)] AS w1,
                         ws[CAST(i + 1 AS INT)] AS w2
                  FROM w, UNNEST(range(1, len(ws))) AS t(i)),
            c AS (SELECT w1, w2, COUNT(*)::BIGINT AS n_ab
                  FROM b GROUP BY 1, 2),
            m AS (SELECT w1, w2, n_ab,
                         SUM(n_ab) OVER ()::DOUBLE AS total,
                         SUM(n_ab) OVER (PARTITION BY w1)::DOUBLE AS n_l,
                         SUM(n_ab) OVER (PARTITION BY w2)::DOUBLE AS n_r
                  FROM c),
            s AS (SELECT w1, w2, n_ab,
                         round(ln((n_ab::DOUBLE * total) / (n_l * n_r)),
                               6) AS pmi
                  FROM m WHERE n_ab >= 5)
            SELECT row_number() OVER (ORDER BY pmi DESC, w1, w2)::BIGINT
                       AS rank,
                   w1, w2, n_ab, pmi
            FROM s ORDER BY rank LIMIT 50
        """,
        # Zipf rank-frequency fit over the top-1000 [a-z]+ words:
        # ln(count) ~ ln(rank) least squares (round-6 absorbs the
        # regr_* streaming-vs-two-pass float association)
        "zipf_fit": """
            WITH w AS (SELECT unnest(regexp_extract_all(text, '[a-z]+'))
                           AS word FROM documents),
            c AS (SELECT word, COUNT(*)::BIGINT AS n FROM w GROUP BY 1),
            r AS (SELECT word, n,
                         row_number() OVER (ORDER BY n DESC, word) AS rank
                  FROM c),
            t AS (SELECT * FROM r WHERE rank <= 1000)
            SELECT round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
                   round(regr_intercept(ln(n), ln(rank)), 6)
                       AS zipf_intercept,
                   round(regr_r2(ln(n), ln(rank)), 6) AS r2,
                   COUNT(*)::BIGINT AS n_points
            FROM t
        """,
        # lexical diversity per source: tokens/types/hapax over
        # lowercase [a-z]+ words; ratios round-6
        "ttr_by_source": """
            WITH w AS (SELECT source,
                              unnest(regexp_extract_all(lower(text),
                                                        '[a-z]+')) AS word
                       FROM documents),
            c AS (SELECT source, word, COUNT(*)::BIGINT AS n
                  FROM w GROUP BY 1, 2)
            SELECT source, SUM(n)::BIGINT AS tokens,
                   COUNT(*)::BIGINT AS types,
                   SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
                   round(COUNT(*)::DOUBLE / SUM(n), 6) AS ttr,
                   round(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE
                         / COUNT(*), 6) AS hapax_ratio
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # per-doc novelty: fraction of the doc's DISTINCT 8-grams
        # (lowercase [a-z0-9]+ words) whose corpus document frequency
        # is 1; the 1-based inclusive list_slice [i:i+7] is exactly
        # Python ws[i-1:i+7] — an 8-word window
        "ngram_novelty": """
            WITH w AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS ws FROM documents),
            g AS (SELECT doc_id,
                         array_to_string(ws[CAST(i AS INT):
                                            CAST(i + 7 AS INT)], ' ')
                             AS gram
                  FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)),
            d AS (SELECT DISTINCT doc_id, gram FROM g),
            df AS (SELECT gram, COUNT(*)::BIGINT AS df FROM d GROUP BY 1),
            j AS (SELECT d.doc_id,
                         CASE WHEN df.df = 1 THEN 1 ELSE 0 END AS novel
                  FROM d JOIN df USING (gram))
            SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_grams,
                   SUM(novel)::BIGINT AS n_novel,
                   round(SUM(novel)::DOUBLE / COUNT(*), 6) AS novelty
            FROM j GROUP BY 1 ORDER BY 1
        """,
        # per-doc character Shannon entropy in nats over Unicode
        # codepoints; ln(N) - sum(n ln n)/N, round-6; empty docs out
        "char_entropy": """
            WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
                        FROM documents WHERE len(text) > 0),
            f AS (SELECT doc_id, c, COUNT(*)::BIGINT AS n
                  FROM ch GROUP BY 1, 2)
            SELECT doc_id::BIGINT AS doc_id, SUM(n)::BIGINT AS n_chars,
                   COUNT(*)::BIGINT AS n_distinct,
                   round(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 6)
                       AS entropy
            FROM f GROUP BY 1 ORDER BY 1
        """,
        # intra-label coherence: micro-scaled-integer centroid (the
        # label_vector_sums form, bit-identical under any summation
        # order), per-vec cosine round-9, per-label mean round-6
        "label_coherence": """
            WITH dims AS (SELECT UNNEST(range(1, 65)) AS d),
            x AS (SELECT vec_id, label, dims.d,
                         CAST(e.embedding[dims.d] AS DOUBLE) AS v,
                         CAST(FLOOR(CAST(e.embedding[dims.d] AS DOUBLE)
                                    * 1000000 + 0.5) AS BIGINT) AS v6
                  FROM embeddings e CROSS JOIN dims),
            cent AS (SELECT label, d,
                            SUM(v6)::DOUBLE / (COUNT(*) * 1000000.0) AS c
                     FROM x GROUP BY 1, 2),
            dots AS (SELECT x.vec_id, x.label,
                            SUM(x.v * cent.c) AS dot,
                            SUM(x.v * x.v) AS nx,
                            SUM(cent.c * cent.c) AS nc
                     FROM x JOIN cent ON x.label = cent.label
                                     AND x.d = cent.d
                     GROUP BY 1, 2),
            cosv AS (SELECT label,
                            round(dot / (sqrt(nx) * sqrt(nc)), 9) AS cos
                     FROM dots)
            SELECT label::BIGINT AS label, COUNT(*)::BIGINT AS n_vecs,
                   round(AVG(cos), 6) AS mean_cos, MIN(cos) AS min_cos
            FROM cosv GROUP BY 1 ORDER BY 1
        """,
        # pairwise label-centroid cosines (upper triangle); centroids
        # share label_coherence's micro-scaled-integer form
        "label_affinity": """
            WITH dims AS (SELECT UNNEST(range(1, 65)) AS d),
            x AS (SELECT label, dims.d,
                         CAST(FLOOR(CAST(e.embedding[dims.d] AS DOUBLE)
                                    * 1000000 + 0.5) AS BIGINT) AS v6
                  FROM embeddings e CROSS JOIN dims),
            cent AS (SELECT label, d,
                            SUM(v6)::DOUBLE / (COUNT(*) * 1000000.0) AS c
                     FROM x GROUP BY 1, 2),
            p AS (SELECT a.label AS label_a, b.label AS label_b,
                         SUM(a.c * b.c) AS dot,
                         SUM(a.c * a.c) AS na, SUM(b.c * b.c) AS nb
                  FROM cent a JOIN cent b ON a.d = b.d
                                         AND a.label < b.label
                  GROUP BY 1, 2)
            SELECT label_a::BIGINT AS label_a, label_b::BIGINT AS label_b,
                   round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
            FROM p ORDER BY 1, 2
        """,
        # CCNet-style LM filter: per-doc cross-entropy under the corpus
        # MLE bigram model (round-6 absorbs float association/ulp)
        "lm_cross_entropy": """
            WITH w AS (SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ws
                       FROM documents),
            big AS (
                SELECT doc_id, ws[CAST(i AS INT)] AS a,
                       ws[CAST(i AS INT) + 1] AS b
                FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t
            ),
            unic AS (SELECT a, COUNT(*) AS cu
                     FROM (SELECT unnest(ws) AS a FROM w) GROUP BY a),
            bigc AS (SELECT a, b, COUNT(*) AS cb FROM big GROUP BY a, b),
            scored AS (SELECT big.doc_id, ln(unic.cu) - ln(bigc.cb) AS nll
                       FROM big JOIN unic USING (a) JOIN bigc USING (a, b))
            SELECT doc_id, round(avg(nll), 6) AS cross_entropy,
                   COUNT(*)::BIGINT AS n_bigrams
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        # BPE trainer counting step: adjacent char pairs inside [a-z]+ runs
        "bpe_pair_counts": """
            WITH words AS (
                SELECT unnest(regexp_extract_all(text, '[a-z]+')) AS w
                FROM documents
            ),
            pairs AS (
                SELECT substr(w, CAST(i AS INT), 2) AS pair
                FROM words, LATERAL (SELECT unnest(range(1, length(w))) AS i) t
            )
            SELECT pair, COUNT(*)::BIGINT AS n
            FROM pairs GROUP BY pair
            ORDER BY n DESC, pair
        """,
        "source_rollup": f"""
            SELECT source,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM({_NTOK})::BIGINT AS n_tokens,
                   COUNT(DISTINCT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')))::BIGINT
                       AS n_distinct_sigs
            FROM documents GROUP BY source ORDER BY source
        """,
        "embedding_near_dups": """
            SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b,
                   a.label::BIGINT AS label
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.25
            ORDER BY vec_a, vec_b
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS q_vec_id, embedding AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5),
            scored AS (
                SELECT q.q_vec_id, e.vec_id,
                       round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 9) AS score
                FROM q CROSS JOIN embeddings e),
            ranked AS (
                SELECT q_vec_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                          ORDER BY score DESC, vec_id) AS rank
                FROM scored)
            SELECT q_vec_id::BIGINT AS q_vec_id, vec_id::BIGINT AS vec_id,
                   rank::BIGINT AS rank
            FROM ranked WHERE rank <= 10 ORDER BY q_vec_id, rank
        """,
        # cosine radius search: every pair strictly above 0.2 (the
        # threshold sits >=1e-4 from every testdata similarity, so the
        # strict > matches numpy float64 bit-for-bit)
        "ann_range_search": """
            WITH q AS (SELECT vec_id AS q_vec_id, embedding AS qe
                       FROM embeddings ORDER BY vec_id LIMIT 5)
            SELECT q.q_vec_id::BIGINT AS q_vec_id,
                   e.vec_id::BIGINT AS vec_id
            FROM q CROSS JOIN embeddings e
            WHERE list_cosine_similarity(q.qe::DOUBLE[],
                                         e.embedding::DOUBLE[]) > 0.2
            ORDER BY q_vec_id, vec_id
        """,
        "media_meta": """
            SELECT doc_id,
                   (7 + octet_length(encode(text)))::BIGINT AS payload_bytes,
                   md5('RFIMG1:' || text) AS payload_md5
            FROM documents ORDER BY doc_id
        """,
        # fake decoder: 8x8x3 image = sha256 digest repeated; mean*100 ==
        # (sum of the 32 digest bytes) * 25 // 8 (exact in float64)
        "media_features": """
            SELECT doc_id,
                   (7 + octet_length(encode(text)))::BIGINT AS payload_bytes,
                   md5('RFIMG1:' || text) AS payload_md5,
                   (list_sum(list_transform(range(32), i ->
                       CAST(('0x' || substr(sha256('RFIMG1:' || text), i*2+1, 2))
                            AS INT))) * 25 // 8)::BIGINT AS fake_pixel_mean_x100
            FROM documents ORDER BY doc_id
        """,
        # resize kernel oracle: the fake 8x8x3 image is the sha256
        # digest tiled (byte idx = flat_idx % 32); a 4x4 mean-pool
        # output pixel is the //4 mean of its 2x2 block, recomputed
        # here from the digest byte list
        "media_resize": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFIMG1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # perceptual-key dedup: the 4x4x3 pooled pixel vector (same
        # digest-byte derivation as media_resize, element-wise instead
        # of summed) is the group key
        "media_phash_dedup": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFIMG1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents),
            k AS (
                SELECT doc_id,
                       array_to_string(list_transform(range(48), k ->
                           (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                          + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                          + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                          + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                           ) // 4), ',') AS phash
                FROM b)
            SELECT MIN(doc_id)::BIGINT AS keeper_doc_id,
                   COUNT(*)::BIGINT AS n_members
            FROM k GROUP BY phash ORDER BY keeper_doc_id
        """,
        # frame sampling oracle: the fake waveform is the digest tiled
        # to 1024 bytes; stride-63 sampling yields 17 frames whose
        # de-normalized sum is a plain digest-byte sum
        "media_frame_sample": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFIMG1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 17::BIGINT AS n_frames,
                   list_sum(list_transform(range(17), j ->
                       db[(j*63) % 32 + 1]))::BIGINT AS frame_sum
            FROM b ORDER BY doc_id
        """,
        # REAL-codec oracles: the engine builds actual PNG / WAV
        # containers whose pixels / samples derive from a prefixed text
        # digest, decodes them with the from-scratch decoders
        # (parsers/pngdec.py, parsers/wavdec.py), and the SQL below
        # recomputes the decoded-content summaries from the same digest
        # — lossless codecs, so equality is exact
        "image_png_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFPNG1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        "audio_wav_frames": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFWAV1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 17::BIGINT AS n_frames,
                   list_sum(list_transform(range(17), j ->
                       (db[(j*63) % 32 + 1] - 128) * 256))::BIGINT AS frame_sum
            FROM b ORDER BY doc_id
        """,
        # GIF real-decode oracle: 8x8 gray indices are the digest
        # tiled to 64 bytes; the 4x4 mean-pool is recomputed per cell
        # (three equal channels → factor 3)
        "image_gif_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFGIF1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   (3 * list_sum(list_transform(range(16), k ->
                       (db[((k//4)*16 + (k%4)*2)     % 32 + 1]
                      + db[((k//4)*16 + (k%4)*2 + 1) % 32 + 1]
                      + db[((k//4)*16 + (k%4)*2 + 8) % 32 + 1]
                      + db[((k//4)*16 + (k%4)*2 + 9) % 32 + 1]
                       ) // 4)))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # G.711 mu-law real-decode oracle: the segment expansion is
        # recomputed arithmetically per compressed byte (complement →
        # segment/mantissa → ((mant*8+132) << seg) - 132, signed)
        "audio_g711_frames": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFULAW1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents),
            u AS (
                SELECT doc_id,
                       list_transform(range(17), j ->
                           255 - db[(j*63) % 32 + 1]) AS uu
                FROM b)
            SELECT doc_id, 17::BIGINT AS n_frames,
                   list_sum(list_transform(uu, v ->
                       (CASE WHEN v >= 128 THEN -1 ELSE 1 END)
                       * (((v % 16) * 8 + 132) * (1 << ((v // 16) % 8))
                          - 132)))::BIGINT AS frame_sum
            FROM u ORDER BY doc_id
        """,
        # windowed audio features over the real PCM16 decode: the
        # xor-derived sample stream has period 1024 (not 32), so the
        # eight 128-sample windows differ; energy, strict sign-flip
        # ZCR (window-internal pairs only) and the max window energy
        # are all integers on the PCM16 grid
        "audio_energy_zcr": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFZCR1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents),
            s AS (
                SELECT doc_id,
                       list_transform(range(1024), i ->
                           (xor(db[i % 32 + 1], db[(i // 32) % 32 + 1])
                            - 128) * 256) AS sm
                FROM b),
            e AS (
                SELECT doc_id, sm,
                       list_transform(range(8), j ->
                           list_sum(list_transform(range(128), k ->
                               sm[j*128 + k + 1] * sm[j*128 + k + 1])))
                           AS we
                FROM s)
            SELECT doc_id, 8::BIGINT AS n_windows,
                   list_sum(we)::BIGINT AS total_energy,
                   list_sum(list_transform(range(1023), i ->
                       CASE WHEN i % 128 <> 127
                                 AND sm[i+1] * sm[i+2] < 0
                            THEN 1 ELSE 0 END))::BIGINT AS total_zcr,
                   list_max(we)::BIGINT AS max_window_energy
            FROM e ORDER BY doc_id
        """,
        # pitch-analysis oracle: per 256-sample window, the lag in
        # [8, 32) maximizing the integer autocorrelation (ties ->
        # smallest lag via list_position's first match), plus the
        # summed peaks — all exact int64 on the PCM16 grid
        "audio_pitch_lags": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFPIT1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents),
            s AS (
                SELECT doc_id,
                       list_transform(range(1024), i ->
                           (xor(db[i % 32 + 1], db[(i // 32) % 32 + 1])
                            - 128) * 256) AS sm
                FROM b),
            w AS (
                SELECT doc_id,
                       list_transform(range(4), wi ->
                           list_transform(range(24), kk ->
                               list_sum(list_transform(
                                   range(256 - (kk + 8)), i ->
                                   sm[wi*256 + i + 1]
                                   * sm[wi*256 + i + kk + 8 + 1]))))
                           AS rr
                FROM s)
            SELECT doc_id, 4::BIGINT AS n_windows,
                   list_sum(list_transform(rr, r ->
                       list_position(r, list_max(r)) + 7))::BIGINT
                       AS best_lag_sum,
                   list_sum(list_transform(rr, r ->
                       list_max(r)))::BIGINT AS r_max_total
            FROM w ORDER BY doc_id
        """,
        # BMP real-decode oracle: same pixel derivation as the PNG
        # one under the RFBMP1 prefix — uncompressed 24-bit DIB, so
        # the 4x4 mean-pool is exactly the PNG expression
        "image_bmp_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFBMP1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # TIFF real-decode oracle: same derivation as PNG/BMP under
        # the RFTIF1 prefix (uncompressed, exact)
        "image_tiff_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFTIF1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # multi-page TIFF oracle: page p uses the digest rotated by
        # p bytes — db[(i+p) % 32] — through the shared 4x4 pooling
        # expansion, summed over the 3 pages
        "tiff_multipage_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFTIFP1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 3::BIGINT AS n_pages,
                   list_sum(list_transform(range(3), p ->
                       list_sum(list_transform(range(48), k ->
                       (db[(((k//12)*48 + ((k%12)//3)*6 + (k%3)) + p) % 32 + 1]
                      + db[(((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) + p) % 32 + 1]
                      + db[(((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) + p) % 32 + 1]
                      + db[(((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) + p) % 32 + 1]
                       ) // 4))))::BIGINT AS pooled_sum
            FROM b ORDER BY doc_id
        """,
        # polyglot phash-BUCKETING oracle: the 1x1 pool at 4-bit
        # precision per channel, rebuilt from the digest each
        # container type selects; pixel (y,x,c) of the RGB kinds is
        # db[(y*24 + x*3 + c) % 32], the GIF gray pixel (y,x) is
        # db[(y*8 + x) % 32] replicated across channels
        "mixed_phash_dedup": """
            WITH p AS (
                SELECT doc_id, text,
                       CASE doc_id % 4
                            WHEN 0 THEN 'RFPNG1:' WHEN 1 THEN 'RFGIF1:'
                            WHEN 2 THEN 'RFBMP1:' ELSE 'RFTIF1:'
                       END AS pref
                FROM documents),
            b AS (
                SELECT doc_id, doc_id % 4 AS kind,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256(pref || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM p),
            k AS (
                SELECT doc_id,
                       array_to_string(list_transform(range(3), c ->
                           CASE WHEN kind = 1 THEN
                               (list_sum(list_transform(range(64), j ->
                                   db[j % 32 + 1])) // 64) // 16
                           ELSE
                               (list_sum(list_transform(range(64), j ->
                                   db[((j//8)*24 + (j%8)*3 + c) % 32
                                      + 1])) // 64) // 16
                           END), ',') AS phash
                FROM b)
            SELECT MIN(doc_id)::BIGINT AS keeper_doc_id,
                   COUNT(*)::BIGINT AS n_members
            FROM k GROUP BY phash ORDER BY keeper_doc_id
        """,
        # TGA oracle: the shared RGB expansion, RFTGA1 prefix
        "image_tga_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFTGA1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # Netpbm P6 oracle: the shared RGB expansion, RFPNM1 prefix
        "image_pnm_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFPNM1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # favicon oracle: the ICO wraps a PNG or legacy DIB entry
        # (doc_id parity) around the SAME 8x8 RFICO1 image, so one
        # digest expansion covers both container forms
        "image_ico_pool": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFICO1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # polyglot decode oracle: doc_id %% 4 picks the container and
        # with it the digest prefix; PNG/BMP/TIFF share the RGB pixel
        # expansion, GIF uses the gray-palette one (x3 channels)
        "image_mixed_pool": """
            WITH p AS (
                SELECT doc_id, text,
                       CASE doc_id % 4
                            WHEN 0 THEN 'RFPNG1:' WHEN 1 THEN 'RFGIF1:'
                            WHEN 2 THEN 'RFBMP1:' ELSE 'RFTIF1:'
                       END AS pref
                FROM documents),
            b AS (
                SELECT doc_id, doc_id % 4 AS kind,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256(pref || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM p)
            SELECT doc_id, 4::BIGINT AS out_h, 4::BIGINT AS out_w,
                   (CASE WHEN kind = 1 THEN
                       3 * list_sum(list_transform(range(16), k ->
                           (db[((k//4)*16 + (k%4)*2)     % 32 + 1]
                          + db[((k//4)*16 + (k%4)*2 + 1) % 32 + 1]
                          + db[((k//4)*16 + (k%4)*2 + 8) % 32 + 1]
                          + db[((k//4)*16 + (k%4)*2 + 9) % 32 + 1]
                           ) // 4))
                    ELSE
                       list_sum(list_transform(range(48), k ->
                       (db[((k//12)*48 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + (k%3)) % 32 + 1]
                      + db[((k//12)*48 + 24 + ((k%12)//3)*6 + 3 + (k%3)) % 32 + 1]
                       ) // 4))
                    END)::BIGINT AS resized_sum
            FROM b ORDER BY doc_id
        """,
        # MJPEG-in-AVI real-decode oracle: frame j is a uniform-gray
        # baseline JPEG at pixel value db[(5j) % 32]; uniform frames
        # under all-ones quantization decode bit-exactly, so the
        # stride-3 sample over 8 frames (j = 0, 3, 6) is recomputed
        # from the digest directly
        "video_mjpeg_frames": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFAVI1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 16::BIGINT AS width, 16::BIGINT AS height,
                   8::BIGINT AS n_frames, 3::BIGINT AS n_sampled,
                   list_sum(list_transform(range(3), j ->
                       db[(5 * j * 3) % 32 + 1]))::BIGINT AS frame_sum
            FROM b ORDER BY doc_id
        """,
        # animated-GIF real-decode oracle: 6 full-canvas uniform
        # frames at gray index db[(3j) % 32], GCE delay 10+j cs;
        # stride-2 sample -> j in (0, 2, 4); total delay = sum(10+j)
        "video_gif_frames": """
            WITH b AS (
                SELECT doc_id,
                       list_transform(range(32), i ->
                           CAST(('0x' || substr(sha256('RFGIFA1:' || text),
                                                i*2+1, 2)) AS BIGINT)) AS db
                FROM documents)
            SELECT doc_id, 6::BIGINT AS n_frames, 3::BIGINT AS n_sampled,
                   list_sum(list_transform(range(3), j ->
                       db[(3 * j * 2) % 32 + 1]))::BIGINT AS frame_sum,
                   75::BIGINT AS delay_total_cs
            FROM b ORDER BY doc_id
        """,
        # sketch-family oracles: expected values precomputed by an
        # INDEPENDENT pure-Python re-derivation of the pinned specs
        # (tools/make_sketch_fixtures.py); fixtures are keyed by a
        # content key recomputed here so the right corpus row-set is
        # selected at any scale factor
        "simhash_signatures": f"""
            SELECT doc_id, simhash
            FROM read_parquet('{_FIXTURES}/simhash_signatures.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY doc_id
        """,
        # near-dup = hamming <= 3 over the independently computed
        # signatures — also checks the 4-band LSH's completeness
        "simhash_near_dups": f"""
            WITH sigs AS (
                SELECT doc_id, simhash
                FROM read_parquet('{_FIXTURES}/simhash_signatures.parquet')
                WHERE corpus_key = (SELECT SUM(n_chars) FROM documents))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_a, doc_b
        """,
        # exact φ-heavy hitters: the Misra-Gries candidate pass is a
        # completeness mechanism only — the answer is plain HAVING
        "heavy_hitters": f"""
            WITH words AS (
                SELECT unnest(regexp_extract_all(text, '{_NTOK_RUN}')) AS w
                FROM documents
            ),
            tot AS (SELECT COUNT(*) AS n FROM words)
            SELECT w AS token, COUNT(*)::BIGINT AS cnt
            FROM words, tot
            GROUP BY w, tot.n
            HAVING COUNT(*) > ({_HH_PHI} * tot.n) // 1000
            ORDER BY cnt DESC, token
        """,
        # HyperLogLog registers/estimate re-derived by an independent
        # single-pass pure-Python implementation of the pinned spec
        # (tools/make_hll_fixture.py); the fixture also freezes the
        # TRUE distinct counts as an accuracy pin
        "hll_distinct_tokens": f"""
            SELECT source, nonzero_regs, est_distinct
            FROM read_parquet('{_FIXTURES}/hll_distinct.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY source
        """,
        "minhash_near_dups": f"""
            SELECT doc_a, doc_b, jaccard
            FROM read_parquet('{_FIXTURES}/minhash_pairs.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY doc_a, doc_b
        """,
        # exact 4-gram Jaccard with the df<=64 stop-gram rule mirrored;
        # integer jaccard_x10000 keeps both sides float-free
        "ngram_jaccard_dups": f"""
            WITH {_NGRAM_PAIRS_CTE}
            SELECT doc_a, doc_b, jaccard_x10000
            FROM ngram_pairs ORDER BY doc_a, doc_b
        """,
        # connected components over the same near-dup pairs: recursive
        # min-label reachability replays the engine's distributed
        # hash-to-min label propagation
        "dedup_clusters": f"""
            WITH RECURSIVE {_NGRAM_PAIRS_CTE},
            edges AS (
                SELECT doc_a AS src, doc_b AS dst FROM ngram_pairs
                UNION ALL
                SELECT doc_b, doc_a FROM ngram_pairs
            ),
            nodes AS (SELECT DISTINCT src AS node FROM edges),
            reach(node, root) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT e.dst, r.root FROM reach r
                JOIN edges e ON e.src = r.node
            )
            SELECT node::BIGINT AS doc_id, MIN(root)::BIGINT AS cluster_keeper
            FROM reach GROUP BY node ORDER BY doc_id
        """,
        "ann_lsh_topk": f"""
            SELECT q_vec_id, vec_id, rank
            FROM read_parquet('{_FIXTURES}/lsh_topk.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY q_vec_id, rank
        """,
        "ann_ivf_topk": f"""
            SELECT q_vec_id, vec_id, rank
            FROM read_parquet('{_FIXTURES}/ivf_topk.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY q_vec_id, rank
        """,
        # benchmark = the 20 id-minimal docs; a corpus doc is
        # contaminated when any of its distinct 8-grams appears in any
        # benchmark doc (same gram definition both sides)
        "decontaminate": """
            WITH bench AS (
                SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20
            ),
            grams AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                           range(greatest(len(ws) - 7, 0)),
                           i -> array_to_string(ws[i+1 : i+8], ' ')))) AS g
                FROM (SELECT doc_id, string_split(text, ' ') AS ws
                      FROM documents)
                WHERE len(ws) >= 8
            ),
            bg AS (SELECT DISTINCT g FROM grams
                   WHERE doc_id IN (SELECT doc_id FROM bench))
            SELECT g.doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_hits
            FROM grams g JOIN bg ON bg.g = g.g
            WHERE g.doc_id NOT IN (SELECT doc_id FROM bench)
            GROUP BY g.doc_id ORDER BY doc_id
        """,
        "stratified_sample": """
            SELECT doc_id::BIGINT AS doc_id, lang
            FROM documents
            WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 10
            ORDER BY doc_id
        """,
        "quality_filter": f"""
            SELECT doc_id::BIGINT AS doc_id
            FROM (SELECT doc_id,
                         {_NTOK} AS n_tokens,
                         length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')) AS n_punct,
                         length(regexp_extract_all(text, '\\b(?:{_STOP})\\b')) AS n_stop
                  FROM documents)
            WHERE n_tokens >= {_QF_MINTOK} AND n_punct * 100 <= {_QF_MAXPUNCT} * n_tokens
              AND n_stop > 0
            ORDER BY doc_id
        """,
        # deterministic PII augmentation (doc-id-derived email/ip/phone)
        # mirrored token-for-token from curation.pii_scrub; patterns are
        # the SAME module constants; counts are taken on the text as it
        # stood before each rule's replacement, same order (email→ip→tel)
        "pii_scrub": f"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact ' || string_split(text, ' ')[1] || '.' ||
                       CAST(doc_id AS VARCHAR) || '@example.' ||
                       CASE doc_id % 3 WHEN 0 THEN 'com'
                                       WHEN 1 THEN 'org' ELSE 'net' END ||
                       ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                       CAST(doc_id * 7 % 256 AS VARCHAR) || '.' ||
                       CAST(doc_id * 13 % 256 AS VARCHAR) ||
                       ' tel 555-' ||
                       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t0
                FROM documents
            ),
            s1 AS (SELECT doc_id, t0,
                          regexp_replace(t0, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
                   FROM aug),
            s2 AS (SELECT doc_id, t0, t1,
                          regexp_replace(t1, '{_PII_IPV4}', '<IP>', 'g') AS t2
                   FROM s1)
            SELECT doc_id::BIGINT AS doc_id,
                   len(regexp_extract_all(t0, '{_PII_EMAIL}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(t1, '{_PII_IPV4}'))::BIGINT AS n_ips,
                   len(regexp_extract_all(t2, '{_PII_PHONE}'))::BIGINT AS n_phones,
                   regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text
            FROM s2 ORDER BY doc_id
        """,
        "length_histogram": f"""
            SELECT ({_NTOK} // 16)::BIGINT AS bucket,
                   COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # exact order statistics: smallest value whose cumulative doc
        # count reaches ceil(p/100 * N) — integer arithmetic both sides
        "length_quantiles": f"""
            WITH t AS (SELECT {_NTOK} AS n_tokens FROM documents),
            n AS (SELECT COUNT(*) AS total FROM t),
            c AS (SELECT n_tokens, COUNT(*) AS cnt FROM t GROUP BY 1),
            cum AS (SELECT n_tokens,
                           SUM(cnt) OVER (ORDER BY n_tokens) AS cum
                    FROM c)
            SELECT p.p_x100::BIGINT AS p_x100,
                   MIN(cum.n_tokens)::BIGINT AS n_tokens
            FROM (VALUES (50), (90), (99)) AS p(p_x100)
            CROSS JOIN n
            JOIN cum ON cum.cum >= (p.p_x100 * n.total + 99) // 100
            GROUP BY p.p_x100 ORDER BY p.p_x100
        """,
        # concat-then-split packing: global exclusive token prefix sum
        # (window) → sequence index/offset; token def = token_stats
        "pack_sequences": f"""
            SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
                   (prefix // {curation_mod.PACK_SEQ_LEN})::BIGINT AS seq_index,
                   (prefix % {curation_mod.PACK_SEQ_LEN})::BIGINT AS seq_offset
            FROM (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS prefix
                FROM (SELECT doc_id, {_NTOK} AS n_tokens
                      FROM documents)
            ) ORDER BY doc_id
        """,
        "training_order": """
            SELECT doc_id::BIGINT AS doc_id,
                   md5(doc_id::VARCHAR || '-epoch0') AS pos
            FROM documents ORDER BY pos
        """,
        # the composed curation pipeline: quality gate -> id-minimal
        # keeper per content hash (QUALIFY) -> packed prefix sums
        "curate_and_pack": f"""
            WITH q AS (
                SELECT doc_id, {_NTOK} AS n_tokens, md5(text) AS h,
                       length(text) - length(regexp_replace(text, '{_PUNCT}', '', 'g')) AS n_punct,
                       length(regexp_extract_all(text, '\\b(?:{_STOP})\\b')) AS n_stop
                FROM documents
            ),
            surv AS (
                SELECT doc_id, n_tokens, h FROM q
                WHERE n_tokens >= {_QF_MINTOK} AND n_punct * 100 <= {_QF_MAXPUNCT} * n_tokens
                  AND n_stop > 0
            ),
            keep AS (
                SELECT doc_id, n_tokens FROM surv
                QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY h)
            ),
            packed AS (
                SELECT doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS prefix
                FROM keep
            )
            SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
                   (prefix // {curation_mod.PACK_SEQ_LEN})::BIGINT AS seq_index,
                   (prefix % {curation_mod.PACK_SEQ_LEN})::BIGINT AS seq_offset
            FROM packed ORDER BY doc_id
        """,
        # per-source keep rates; CASE arms generated from the same
        # rate table the engine uses
        "mixture_sample": f"""
            SELECT doc_id::BIGINT AS doc_id, source
            FROM documents
            WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 <
                  CASE source
                  {' '.join(f"WHEN '{s}' THEN {r}" for s, r in sorted(curation_mod.MIXTURE_RATES_PCT.items()))}
                  ELSE {curation_mod.MIXTURE_DEFAULT_PCT} END
            ORDER BY doc_id
        """,
        # hopping window (1h window / 30min hop): each event expands to
        # window/hop rows, then a plain grouped count
        "events_sliding": """
            SELECT ws::BIGINT AS window_start_us, event_type,
                   COUNT(*)::BIGINT AS n_events
            FROM (
                -- floor(), not integer '//': DuckDB '//' truncates
                -- toward zero while the engine's numpy '//' floors,
                -- which diverges for pre-1970 (negative-epoch) rows
                SELECT CAST(floor(epoch_us(ts) / 1800000000.0) AS BIGINT)
                       * 1800000000 - 1800000000 * u.i AS ws,
                       event_type
                FROM events, (SELECT unnest(range(2)) AS i) u
            )
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Gopher-style repetition fractions, ×1000 floor-scaled; the
        # (word / bigram / dup-trigram) gram definitions match
        # ops/curation.repetition_signals exactly (split on ' ')
        "repetition_signals": f"""
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS ws,
                       len(string_split(text, ' ')) AS n
                FROM documents
            ),
            topw AS (
                SELECT doc_id, MAX(c) AS maxw FROM (
                    SELECT doc_id, COUNT(*) AS c
                    FROM (SELECT doc_id, unnest(ws) AS w FROM base)
                    GROUP BY doc_id, w)
                GROUP BY doc_id
            ),
            topb AS (
                SELECT doc_id, MAX(c) AS maxb FROM (
                    SELECT doc_id, COUNT(*) AS c
                    FROM (SELECT doc_id,
                                 unnest(list_transform(range(n - 1),
                                     i -> ws[i+1] || ' ' || ws[i+2])) AS g
                          FROM base WHERE n > 1)
                    GROUP BY doc_id, g)
                GROUP BY doc_id
            ),
            dupt AS (
                SELECT doc_id,
                       SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dupp
                FROM (
                    SELECT doc_id, COUNT(*) AS c
                    FROM (SELECT doc_id,
                                 unnest(list_transform(range(n - 2),
                                     i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])) AS g
                          FROM base WHERE n > 2)
                    GROUP BY doc_id, g)
                GROUP BY doc_id
            )
            SELECT b.doc_id::BIGINT AS doc_id,
                   (1000 * topw.maxw // b.n)::BIGINT AS top_word_x1000,
                   COALESCE(1000 * topb.maxb // (b.n - 1), 0)::BIGINT AS top_bigram_x1000,
                   COALESCE(1000 * dupt.dupp // (b.n - 2), 0)::BIGINT AS dup_trigram_x1000,
                   (CASE WHEN 1000 * topw.maxw // b.n <= {curation_mod.REP_TOP_WORD_X1000}
                          AND COALESCE(1000 * topb.maxb // (b.n - 1), 0) <= {curation_mod.REP_TOP_BIGRAM_X1000}
                          AND COALESCE(1000 * dupt.dupp // (b.n - 2), 0) <= {curation_mod.REP_DUP_TRIGRAM_X1000}
                         THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM base b
            JOIN topw USING (doc_id)
            LEFT JOIN topb USING (doc_id)
            LEFT JOIN dupt USING (doc_id)
            ORDER BY doc_id
        """,
        # deterministic as-of join: (date, orderkey) packed into one
        # int64 so "latest order" is a plain MAX on both sides
        "events_order_asof": """
            WITH em AS (
                SELECT e.event_id, e.user_id,
                       MAX(datediff('day', DATE '1970-01-01', o.o_orderdate)
                           * 10000000000 + o.o_orderkey) AS enc
                FROM events e LEFT JOIN orders o
                  ON o.o_custkey = e.user_id
                 AND o.o_orderdate <= CAST(e.ts AS DATE)
                GROUP BY e.event_id, e.user_id
            )
            SELECT event_id::BIGINT AS event_id,
                   user_id::BIGINT AS user_id,
                   COALESCE(enc % 10000000000, -1)::BIGINT AS o_orderkey,
                   COALESCE(enc // 10000000000, -1)::BIGINT AS o_orderdate_days
            FROM em ORDER BY event_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))::BIGINT AS sum_qty,
                   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS sum_base_price_cents,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))::BIGINT AS sum_disc_price_c4,
                   COUNT(*)::BIGINT AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_customers": """
            WITH per AS (
                SELECT o_custkey,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))::BIGINT AS revenue_cents,
                       COUNT(*)::BIGINT AS n_orders
                FROM orders GROUP BY 1)
            SELECT p.o_custkey, c.c_name, p.revenue_cents, p.n_orders
            FROM per p JOIN customer c ON c.c_custkey = p.o_custkey
            ORDER BY revenue_cents DESC, o_custkey LIMIT 10
        """,
        "event_type_stats": """
            SELECT event_type,
                   COUNT(*)::BIGINT AS n_events,
                   SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_value_micros,
                   MIN(user_id)::BIGINT AS min_user,
                   MAX(user_id)::BIGINT AS max_user
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour,
                   event_type,
                   COUNT(*)::BIGINT AS n_events,
                   SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT))::BIGINT AS sum_value_micros
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "purchase_attribution": """
            SELECT event_id::BIGINT AS event_id,
                   user_id::BIGINT AS user_id,
                   ts,
                   last_click_ts
            FROM (
                SELECT event_id, user_id, ts, event_type,
                       MAX(CASE WHEN event_type = 'click' THEN ts END)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                           AS last_click_ts
                FROM events)
            WHERE event_type = 'purchase'
            ORDER BY event_id
        """,
        "nation_customer_counts": """
            SELECT c.c_nationkey::BIGINT AS c_nationkey,
                   n.n_name,
                   COUNT(*)::BIGINT AS n_customers,
                   SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT))::BIGINT AS sum_acctbal_cents
            FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2 ORDER BY 1
        """,
        # exact COUNT(DISTINCT) per tumbling hour via two-level dedup
        "events_hourly_uniques": """
            SELECT date_trunc('hour', ts) AS hour,
                   COUNT(DISTINCT user_id)::BIGINT AS n_unique_users
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # weekly cohort retention; weeks are Monday-aligned integer
        # indices ((epoch_days + 3) // 7 — 1970-01-01 was a Thursday),
        # the same arithmetic the engine uses, so no date_trunc
        # semantics can diverge
        "cohort_retention": """
            WITH w AS (
                SELECT DISTINCT user_id,
                       CAST(FLOOR((DATE_DIFF('day', DATE '1970-01-01', ts)
                                   + 3) / 7.0) AS BIGINT) AS wk
                FROM events
            ), f AS (
                SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY 1
            )
            SELECT f.cohort_week AS cohort_week,
                   (w.wk - f.cohort_week)::BIGINT AS week_off,
                   COUNT(*)::BIGINT AS n_users
            FROM w JOIN f USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # DAU / trailing-7-day WAU per event day, plus the exact
        # integer stickiness ratio; days are epoch-day integers
        # (DATE_DIFF day-boundary counts = ts_us // 86_400e6)
        "rolling_active_users": """
            WITH p AS (
                SELECT DISTINCT
                       DATE_DIFF('day', DATE '1970-01-01', ts)::BIGINT
                           AS day,
                       user_id
                FROM events
            ), days AS (SELECT DISTINCT day FROM p)
            SELECT d.day AS day,
                   COUNT(DISTINCT CASE WHEN p.day = d.day
                                       THEN p.user_id END)::BIGINT AS dau,
                   COUNT(DISTINCT p.user_id)::BIGINT AS wau,
                   ((COUNT(DISTINCT CASE WHEN p.day = d.day
                                         THEN p.user_id END) * 1000)
                    // COUNT(DISTINCT p.user_id))::BIGINT
                       AS stickiness_x1000
            FROM days d JOIN p ON p.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day ORDER BY 1
        """,
        # daily anomaly flags per event type: cnt > mean + 2σ stated in
        # exact integer arithmetic (n·cnt − T > 0 and (n·cnt − T)² >
        # 4·(n·Q − T²), population σ) — no float mean/σ on either side
        "event_spike_days": """
            WITH c AS (
                SELECT event_type,
                       DATE_DIFF('day', DATE '1970-01-01', ts)::BIGINT
                           AS day,
                       COUNT(*)::BIGINT AS n_events
                FROM events GROUP BY 1, 2
            ), s AS (
                SELECT event_type, COUNT(*)::BIGINT AS n_days,
                       SUM(n_events)::BIGINT AS total,
                       SUM(n_events * n_events)::BIGINT AS total_sq
                FROM c GROUP BY 1
            )
            SELECT c.event_type, c.day, c.n_events,
                   (CASE WHEN (s.n_days * c.n_events - s.total) > 0
                          AND (s.n_days * c.n_events - s.total)
                              * (s.n_days * c.n_events - s.total)
                              > 4 * (s.n_days * s.total_sq
                                     - s.total * s.total)
                         THEN 1 ELSE 0 END)::BIGINT AS spike
            FROM c JOIN s USING (event_type)
            ORDER BY c.event_type, c.day
        """,
        # inter-arrival gap quantiles per event type (gap attributed
        # to the LATER event; date_diff truncates each side to seconds
        # before differencing); smallest-value-at-ceil-rank quantile
        # idiom shared with source_length_quantiles
        "event_gap_quantiles": """
            WITH g AS (SELECT event_type,
                              date_diff('second',
                                        lag(ts) OVER (PARTITION BY user_id
                                                      ORDER BY ts, event_id),
                                        ts) AS gap
                       FROM events),
            f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
            n AS (SELECT event_type, COUNT(*)::BIGINT AS n_gaps
                  FROM f GROUP BY 1),
            c AS (SELECT event_type, gap, COUNT(*) AS cnt
                  FROM f GROUP BY 1, 2),
            cum AS (SELECT event_type, gap,
                           SUM(cnt) OVER (PARTITION BY event_type
                                          ORDER BY gap) AS cum
                    FROM c)
            SELECT cum.event_type, p.p_x100::BIGINT AS p_x100,
                   MIN(cum.gap)::BIGINT AS gap_s, n.n_gaps
            FROM (VALUES (50), (90), (99)) AS p(p_x100)
            CROSS JOIN n
            JOIN cum ON cum.event_type = n.event_type
                    AND cum.cum >= (p.p_x100 * n.n_gaps + 99) // 100
            GROUP BY cum.event_type, p.p_x100, n.n_gaps
            ORDER BY cum.event_type, p.p_x100
        """,
        # first-order Markov transitions over each user's
        # (ts, event_id)-ordered stream; row-normalized, round-6
        "event_transition_matrix": """
            WITH s AS (SELECT user_id, event_type,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
                       FROM events),
            c AS (SELECT event_type AS prev_type, nxt AS next_type,
                         COUNT(*)::BIGINT AS n
                  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
            m AS (SELECT prev_type, SUM(n)::BIGINT AS total
                  FROM c GROUP BY 1)
            SELECT c.prev_type, c.next_type, c.n,
                   round(c.n::DOUBLE / m.total, 6) AS p
            FROM c JOIN m USING (prev_type)
            ORDER BY c.prev_type, c.next_type
        """,
        # events-per-session histogram; session breaks on a >1800 s
        # gap (truncated-seconds date_diff semantics), ordering pinned
        # on (ts, event_id) in BOTH window passes
        "session_length_histogram": """
            WITH o AS (SELECT user_id, ts, event_id,
                              CASE WHEN date_diff('second',
                                       lag(ts) OVER (
                                           PARTITION BY user_id
                                           ORDER BY ts, event_id), ts)
                                        > 1800 THEN 1 ELSE 0 END AS brk
                       FROM events),
            s AS (SELECT user_id,
                         SUM(brk) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sess
                  FROM o),
            l AS (SELECT user_id, sess, COUNT(*)::BIGINT AS n_events
                  FROM s GROUP BY 1, 2)
            SELECT n_events AS session_len, COUNT(*)::BIGINT AS n_sessions
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q4-shaped SEMI-join: window orders with >=1 lineitem
        # shipped more than 30 days after the order date, per priority
        "late_order_priority": """
            SELECT o.o_orderpriority, COUNT(*)::BIGINT AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= DATE '1995-01-01'
              AND o.o_orderdate < DATE '1995-07-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 30 DAY)
            GROUP BY 1 ORDER BY 1
        """,
        # ANTI-join churn report: customers with NO order in the
        # window, counted per nation
        "inactive_customers": """
            SELECT n.n_name, COUNT(*)::BIGINT AS n_inactive
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderdate >= DATE '1995-01-01'
                                AND o.o_orderdate < DATE '1995-07-01')
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q6-shaped forecast: price and discount each round to
        # their fixed-point grid FIRST, so the product is exact int64
        # in 1e-6 units and the discount window is an integer compare
        "forecast_revenue": """
            SELECT SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)
                       )::BIGINT AS revenue_c6,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem
            WHERE l_shipdate >= DATE '1995-01-01'
              AND l_shipdate < DATE '1996-01-01'
              AND CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)
                  BETWEEN 500 AND 700
              AND l_quantity < 24
        """,
        # daily revenue + trailing 7-row moving average; integer-cent
        # window sums, ONE division rounded to 6 on both sides
        "daily_revenue_ma7": """
            WITH d AS (
                SELECT DATE_DIFF('day', DATE '1970-01-01',
                                 o_orderdate)::BIGINT AS day,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                AS BIGINT))::BIGINT AS rev_c2,
                       COUNT(*)::BIGINT AS n_orders
                FROM orders GROUP BY 1)
            SELECT day, n_orders, rev_c2,
                   round(CAST(SUM(rev_c2) OVER w AS DOUBLE)
                         / (100.0 * COUNT(*) OVER w), 6) AS ma7
            FROM d
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY day
        """,
        # TPC-H Q3-shaped top-k: revenue on the forecast_revenue
        # fixed-point grid (cents x 1e-4 discount units), orderkey ties
        # TPC-H Q15-shaped: every supplier attaining the max windowed
        # revenue (ties), on the regional_revenue c4 grid
        "top_supplier": """
            WITH r AS (
                SELECT l_suppkey AS s_suppkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                      * 10000 + 0.5) AS BIGINT))
                           AS total_rev_c4
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY 1)
            SELECT r.s_suppkey::BIGINT AS s_suppkey, s_name,
                   total_rev_c4::BIGINT AS total_rev_c4
            FROM r JOIN supplier USING (s_suppkey)
            WHERE total_rev_c4 = (SELECT MAX(total_rev_c4) FROM r)
            ORDER BY s_suppkey
        """,
        # TPC-H Q10-shaped: top-20 customers by returned-item revenue
        # in a quarter; ties break on c_custkey ascending
        "returned_item_revenue": """
            WITH cr AS (
                SELECT o_custkey AS c_custkey,
                       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                      * 10000 + 0.5) AS BIGINT))
                           AS revenue_c4
                FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1995-07-01'
                  AND o_orderdate < TIMESTAMP '1995-10-01'
                GROUP BY 1)
            SELECT c_custkey::BIGINT AS c_custkey, c_name, n_name,
                   revenue_c4::BIGINT AS revenue_c4
            FROM cr JOIN customer USING (c_custkey)
            JOIN nation ON n_nationkey = c_nationkey
            ORDER BY revenue_c4 DESC, c_custkey LIMIT 20
        """,
        # TPC-H Q17-shaped correlated aggregate: the inner per-part
        # AVG folds to the exact integer predicate 5*qty*n < sum_qty
        # (quantities are integer-valued on both sides)
        "small_qty_revenue": """
            WITH bl AS (
                SELECT l_partkey,
                       CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS price_c2
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE p_brand = 'Brand#4'),
            st AS (SELECT l_partkey, SUM(qty) AS sum_qty,
                          COUNT(*) AS n
                   FROM bl GROUP BY 1)
            SELECT COALESCE(SUM(price_c2), 0)::BIGINT AS total_price_c2,
                   COUNT(*)::BIGINT AS n_items,
                   round(COALESCE(SUM(price_c2), 0) / 700.0, 6)
                       AS avg_yearly
            FROM bl JOIN st USING (l_partkey)
            WHERE 5 * bl.qty * st.n < st.sum_qty
        """,
        # out-of-order arrival audit: running max in event_id order
        # per type (int64 microseconds), one round-6 division
        "late_events": """
            WITH x AS (
                SELECT event_type, ts,
                       MAX(ts) OVER (PARTITION BY event_type
                                     ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS pm
                FROM events)
            SELECT event_type, COUNT(*)::BIGINT AS n_events,
                   SUM(CASE WHEN pm IS NOT NULL AND ts < pm
                            THEN 1 ELSE 0 END)::BIGINT AS n_late,
                   round(SUM(CASE WHEN pm IS NOT NULL AND ts < pm
                                  THEN 1 ELSE 0 END)::DOUBLE
                         / COUNT(*), 6) AS late_frac
            FROM x GROUP BY 1 ORDER BY 1
        """,
        # RFM quartiles: integer metrics, row_number ranks with a
        # custkey tie-break, closed-form 1 + ((rank-1)*4) // n edges
        "customer_rfm": """
            WITH s AS (
                SELECT o_custkey AS c_custkey,
                       MAX(DATE_DIFF('day', DATE '1970-01-01',
                                     o_orderdate))::BIGINT AS last_day,
                       COUNT(*)::BIGINT AS n_orders,
                       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                AS BIGINT))::BIGINT AS total_c2
                FROM orders GROUP BY 1),
            r AS (
                SELECT *,
                       row_number() OVER (ORDER BY last_day DESC,
                                          c_custkey) AS rr,
                       row_number() OVER (ORDER BY n_orders DESC,
                                          c_custkey) AS fr,
                       row_number() OVER (ORDER BY total_c2 DESC,
                                          c_custkey) AS mr,
                       COUNT(*) OVER () AS n
                FROM s),
            q AS (
                SELECT c_custkey, last_day, n_orders, total_c2,
                       (1 + ((rr - 1) * 4) // n)::BIGINT AS r_q,
                       (1 + ((fr - 1) * 4) // n)::BIGINT AS f_q,
                       (1 + ((mr - 1) * 4) // n)::BIGINT AS m_q
                FROM r)
            SELECT c_custkey::BIGINT AS c_custkey, last_day, n_orders,
                   total_c2, r_q, f_q, m_q,
                   (100 * r_q + 10 * f_q + m_q)::BIGINT AS rfm_code
            FROM q ORDER BY c_custkey
        """,
        # TPC-H Q8-shaped market share: NATION_2's fraction of PROMO
        # revenue in ASIA's market per order-year; one double division
        # of two exact int64 sums, rounded to 6 on both sides
        "market_share": """
            WITH o AS (
                SELECT o_orderkey, year(o_orderdate)::BIGINT AS o_year
                FROM orders JOIN customer ON c_custkey = o_custkey
                JOIN nation ON n_nationkey = c_nationkey
                JOIN region ON r_regionkey = n_regionkey
                WHERE r_name = 'ASIA'
                  AND o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1997-01-01'),
            l AS (
                SELECT l_orderkey,
                       CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT) AS rev_c4,
                       CASE WHEN n2.n_name = 'NATION_2' THEN 1 ELSE 0 END
                           AS is_nat
                FROM lineitem JOIN part ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s_nationkey
                WHERE p_type = 'PROMO')
            SELECT o_year, SUM(rev_c4)::BIGINT AS total_c4,
                   SUM(rev_c4 * is_nat)::BIGINT AS nation_c4,
                   round(CAST(SUM(rev_c4 * is_nat) AS DOUBLE)
                         / SUM(rev_c4), 6) AS mkt_share
            FROM o JOIN l ON l_orderkey = o_orderkey
            GROUP BY o_year ORDER BY o_year
        """,
        # TPC-H Q7-shaped: cross-nation revenue per ship-year, both
        # directions, c4 grid
        "volume_shipping": """
            WITH sn AS (
                SELECT s_suppkey, n_name AS supp_nation
                FROM supplier JOIN nation ON n_nationkey = s_nationkey
                WHERE n_name IN ('NATION_1', 'NATION_3')),
            cn AS (
                SELECT c_custkey, n_name AS cust_nation
                FROM customer JOIN nation ON n_nationkey = c_nationkey
                WHERE n_name IN ('NATION_1', 'NATION_3'))
            SELECT supp_nation, cust_nation,
                   year(l_shipdate)::BIGINT AS l_year,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT))::BIGINT
                       AS revenue_c4
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            JOIN sn ON s_suppkey = l_suppkey
            JOIN cn ON c_custkey = o_custkey
            WHERE supp_nation <> cust_nation
              AND l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        # TPC-H Q9-shaped: 'red'-part revenue by supplier nation and
        # order year (no partsupp leg in this corpus)
        "nation_part_revenue": """
            SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT))::BIGINT
                       AS revenue_c4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # TPC-H Q14-shaped: PROMO revenue share per ship-month; one
        # double division of two exact int64 sums, rounded to 6
        "promo_revenue_share": """
            WITH l AS (
                SELECT (year(l_shipdate) * 100
                        + month(l_shipdate))::BIGINT AS ship_month,
                       CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                  * 10000 + 0.5) AS BIGINT) AS rev_c4,
                       CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END
                           AS is_promo
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1997-01-01')
            SELECT ship_month,
                   SUM(rev_c4 * is_promo)::BIGINT AS promo_c4,
                   SUM(rev_c4)::BIGINT AS total_c4,
                   round(100.0 * SUM(rev_c4 * is_promo) / SUM(rev_c4), 6)
                       AS promo_share
            FROM l GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q13-shaped: orders-per-customer histogram including
        # the zero bucket (LEFT-join semantics)
        "customer_order_distribution": """
            WITH c AS (
                SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
                FROM customer LEFT JOIN orders ON o_custkey = c_custkey
                GROUP BY 1)
            SELECT c_count::BIGINT AS c_count,
                   COUNT(*)::BIGINT AS custdist
            FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC
        """,
        # TPC-H Q18-shaped: orders whose lineitem quantity total
        # exceeds 250, top-100 by total price (c2 grid, orderkey ties)
        "large_volume_customers": """
            WITH q AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                           AS sum_qty
                FROM lineitem GROUP BY 1
                HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                       > 250)
            SELECT c_custkey::BIGINT AS c_custkey, c_name,
                   o_orderkey::BIGINT AS o_orderkey, o_orderdate,
                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                       AS o_totalprice_c2,
                   sum_qty::BIGINT AS sum_qty
            FROM q JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            ORDER BY o_totalprice_c2 DESC, o_orderkey LIMIT 100
        """,
        # TPC-H Q19-shaped OR-of-ANDs probe: three brand × size ×
        # quantity conjunctions, single exact c4 revenue row
        "disjunctive_revenue": """
            SELECT COALESCE(SUM(CAST(FLOOR(l_extendedprice
                                           * (1 - l_discount) * 10000
                                           + 0.5) AS BIGINT)),
                            0)::BIGINT AS revenue_c4,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        # TPC-H Q2-shaped: per eligible part, the minimum unit price
        # among region suppliers with the lowest suppkey breaking
        # ties — the argmin packs into one int64 MIN (unit_c2 * 2^21
        # + suppkey), decomposed after the aggregate
        "min_cost_supplier": """
            WITH rs AS (
                SELECT s_suppkey, s_name,
                       CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)
                           AS s_acctbal_c2
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'),
            ep AS (
                SELECT p_partkey, p_brand FROM part
                WHERE p_size % 5 = 0),
            u AS (
                SELECT l_partkey AS p_partkey,
                       MIN(CAST(FLOOR(l_extendedprice * 100
                                      / l_quantity + 0.5) AS BIGINT)
                           * 2097152 + l_suppkey) AS packed
                FROM lineitem
                JOIN rs ON l_suppkey = s_suppkey
                JOIN ep ON l_partkey = p_partkey
                GROUP BY 1)
            SELECT u.p_partkey::BIGINT AS p_partkey, ep.p_brand,
                   (packed // 2097152)::BIGINT AS min_unit_c2,
                   (packed % 2097152)::BIGINT AS s_suppkey,
                   rs.s_name, rs.s_acctbal_c2::BIGINT AS s_acctbal_c2
            FROM u JOIN ep ON u.p_partkey = ep.p_partkey
            JOIN rs ON packed % 2097152 = rs.s_suppkey
            ORDER BY s_acctbal_c2 DESC, p_partkey LIMIT 100
        """,
        # TPC-H Q11-shaped: per-part value from one nation's
        # suppliers, HAVING value > total/1000 kept in integers
        "part_value_share": """
            WITH v AS (
                SELECT l_partkey AS p_partkey,
                       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                AS BIGINT)
                           * (10000 - CAST(FLOOR(l_discount * 10000
                                                 + 0.5) AS BIGINT)))
                           AS value_c6
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_3'
                GROUP BY 1)
            SELECT p_partkey::BIGINT AS p_partkey,
                   value_c6::BIGINT AS value_c6
            FROM v
            WHERE value_c6 * 1000 > (SELECT SUM(value_c6) FROM v)
            ORDER BY value_c6 DESC, p_partkey
        """,
        # TPC-H Q12-shaped: shipping-delay buckets x critical /
        # non-critical order priority counts (no l_shipmode in this
        # corpus; the delay bucket is the mode stand-in)
        "delay_bucket_priority": """
            SELECT LEAST(GREATEST(
                       (epoch_us(l_shipdate)
                        - epoch_us(o_orderdate))
                       // (30 * 86400000000), 0), 3)::BIGINT
                       AS delay_bucket,
                   SUM(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS n_critical,
                   SUM(CASE WHEN o_orderpriority IN
                            ('1-URGENT', '2-HIGH')
                       THEN 0 ELSE 1 END)::BIGINT AS n_other
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        # TPC-H Q16-shaped: distinct suppliers per part class,
        # excluding one brand / one type / low-balance suppliers
        "supplier_count_by_part": """
            SELECT p_brand, p_type, p_size::BIGINT AS p_size,
                   COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
              AND s_acctbal >= 600.0
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        # TPC-H Q20-shaped: suppliers of one nation who shipped more
        # than 2x the per-supplier average quantity of some part
        "dominant_part_suppliers": """
            WITH pairs AS (
                SELECT l_partkey, l_suppkey,
                       SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                           AS qty
                FROM lineitem GROUP BY 1, 2),
            tot AS (
                SELECT l_partkey, SUM(qty) AS total_qty,
                       COUNT(*) AS ns
                FROM pairs GROUP BY 1)
            SELECT s_suppkey::BIGINT AS s_suppkey, s_name,
                   COUNT(*)::BIGINT AS n_parts_dominated
            FROM pairs
            JOIN tot ON pairs.l_partkey = tot.l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE qty * ns > 2 * total_qty AND n_name = 'NATION_19'
            GROUP BY 1, 2 ORDER BY s_suppkey
        """,
        # TPC-H Q21-shaped: over finished multi-supplier orders, the
        # suppliers who were the SOLE late shipper (ship > order date
        # + 45 days), counted per supplier
        "sole_late_suppliers": """
            WITH ls AS (
                SELECT l_orderkey, l_suppkey,
                       MAX(epoch_us(l_shipdate)) AS ship_us
                FROM lineitem GROUP BY 1, 2),
            j AS (
                SELECT l_orderkey, l_suppkey,
                       CASE WHEN ship_us > epoch_us(o_orderdate)
                                 + 45 * 86400000000::BIGINT
                            THEN 1 ELSE 0 END AS late
                FROM ls JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'),
            per AS (
                SELECT l_orderkey, COUNT(*) AS n_supp,
                       SUM(late) AS n_late
                FROM j GROUP BY 1)
            SELECT l_suppkey::BIGINT AS s_suppkey, s_name,
                   COUNT(*)::BIGINT AS numwait
            FROM j
            JOIN per ON j.l_orderkey = per.l_orderkey
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE j.late = 1 AND per.n_supp >= 2 AND per.n_late = 1
            GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey LIMIT 100
        """,
        # TPC-H Q22-shaped: per segment, never-ordered customers
        # above the positive-balance average of the segment set; the
        # compare stays in integers (acctbal_c2 * n > sum_c2)
        "idle_customer_balance": """
            WITH pos AS (
                SELECT COUNT(*) AS n,
                       SUM(CAST(FLOOR(c_acctbal * 100 + 0.5)
                                AS BIGINT)) AS sum_c2
                FROM customer
                WHERE c_mktsegment IN ('BUILDING', 'MACHINERY',
                                       'FURNITURE')
                  AND c_acctbal > 0.0)
            SELECT c_mktsegment, COUNT(*)::BIGINT AS n_custs,
                   SUM(CAST(FLOOR(c_acctbal * 100 + 0.5)
                            AS BIGINT))::BIGINT AS total_acctbal_c2
            FROM customer, pos
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY',
                                   'FURNITURE')
              AND CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
                  * pos.n > pos.sum_c2
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >=
                                    TIMESTAMP '1999-01-01')
            GROUP BY 1 ORDER BY 1
        """,
        "shipping_priority": """
            WITH o AS (
                SELECT o_orderkey, o_orderdate FROM orders
                WHERE o_orderdate < TIMESTAMP '1995-06-15'
                  AND o_custkey IN (SELECT c_custkey FROM customer
                                    WHERE c_mktsegment = 'BUILDING')),
            l AS (
                SELECT l_orderkey,
                       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5)
                                AS BIGINT)
                           * (10000 - CAST(FLOOR(l_discount * 10000
                                                 + 0.5) AS BIGINT)))
                           AS rev_c6
                FROM lineitem WHERE l_shipdate > TIMESTAMP '1995-06-15'
                GROUP BY 1)
            SELECT o.o_orderkey::BIGINT AS o_orderkey,
                   CAST(l.rev_c6 AS BIGINT) AS rev_c6, o.o_orderdate
            FROM o JOIN l ON l.l_orderkey = o.o_orderkey
            ORDER BY rev_c6 DESC, o_orderkey LIMIT 10
        """,
        # exact global length rank (RANK()-1 = strictly-smaller count,
        # the empirical-CDF numerator) per document
        "length_rank_cdf": """
            SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
                   (RANK() OVER (ORDER BY n_chars) - 1)::BIGINT
                       AS n_smaller
            FROM documents ORDER BY doc_id
        """,
        # covariance-matrix integer numerators n*Sxy - Sx*Sy over
        # milli-scaled components (upper triangle, 0-based dims)
        "embedding_covariance": """
            WITH dims AS (SELECT UNNEST(range(1, 65)) AS d),
            x AS (SELECT vec_id, dims.d AS d,
                         CAST(FLOOR(CAST(e.embedding[dims.d] AS DOUBLE)
                                    * 1000 + 0.5) AS BIGINT) AS v
                  FROM embeddings e CROSS JOIN dims),
            p AS (SELECT a.d AS di, b.d AS dj, SUM(a.v * b.v) AS sxy,
                         COUNT(*) AS n
                  FROM x a JOIN x b ON a.vec_id = b.vec_id
                                   AND a.d <= b.d
                  GROUP BY 1, 2),
            s AS (SELECT d, SUM(v) AS sx FROM x GROUP BY 1)
            SELECT (p.di - 1)::BIGINT AS i, (p.dj - 1)::BIGINT AS j,
                   CAST(p.n * p.sxy - sa.sx * sb.sx AS BIGINT)
                       AS cov_num
            FROM p JOIN s sa ON sa.d = p.di JOIN s sb ON sb.d = p.dj
            ORDER BY 1, 2
        """,
        # per-event-type OLS slope of daily count vs epoch day as
        # exact integer moments (event_spike_days arithmetic, 1st order)
        "event_trend": """
            WITH c AS (
                SELECT event_type,
                       DATE_DIFF('day', DATE '1970-01-01', ts)::BIGINT
                           AS day,
                       COUNT(*)::BIGINT AS n_events
                FROM events GROUP BY 1, 2)
            SELECT event_type, COUNT(*)::BIGINT AS n_days,
                   SUM(n_events)::BIGINT AS n_events,
                   CAST(COUNT(*) * SUM(day * n_events)
                        - SUM(day) * SUM(n_events) AS BIGINT) AS slope_num,
                   CAST(COUNT(*) * SUM(day * day)
                        - SUM(day) * SUM(day) AS BIGINT) AS slope_den,
                   round(CAST(COUNT(*) * SUM(day * n_events)
                              - SUM(day) * SUM(n_events) AS DOUBLE)
                         / CAST(COUNT(*) * SUM(day * day)
                                - SUM(day) * SUM(day) AS DOUBLE), 9)
                       AS slope
            FROM c GROUP BY 1 ORDER BY 1
        """,
        # pairwise source-vocabulary Jaccard over distinct [a-z]+ words
        "source_vocab_jaccard": """
            WITH t AS (SELECT source,
                              unnest(regexp_extract_all(lower(text),
                                                        '[a-z]+')) AS tok
                       FROM documents),
            w AS (SELECT DISTINCT source, tok FROM t),
            v AS (SELECT source, COUNT(*)::BIGINT AS nv FROM w GROUP BY 1),
            i AS (SELECT a.source AS source_a, b.source AS source_b,
                         COUNT(*)::BIGINT AS n_inter
                  FROM w a JOIN w b ON a.tok = b.tok
                                   AND a.source < b.source
                  GROUP BY 1, 2)
            SELECT va.source AS source_a, vb.source AS source_b,
                   COALESCE(i.n_inter, 0)::BIGINT AS n_inter,
                   (va.nv + vb.nv - COALESCE(i.n_inter, 0))::BIGINT
                       AS n_union,
                   round(COALESCE(i.n_inter, 0)::DOUBLE
                         / (va.nv + vb.nv - COALESCE(i.n_inter, 0)), 6)
                       AS jaccard
            FROM v va JOIN v vb ON va.source < vb.source
            LEFT JOIN i ON i.source_a = va.source
                       AND i.source_b = vb.source
            ORDER BY 1, 2
        """,
        # pairwise Jensen-Shannon divergence between source unigram
        # distributions; x·ln x := 0 at zero, ONE round-6 per pair
        # (absorbs summation association / libm ulp)
        "source_js_divergence": """
            WITH w AS (SELECT source,
                              unnest(regexp_extract_all(lower(text),
                                                        '[a-z]+')) AS word
                       FROM documents),
            c AS (SELECT source, word, COUNT(*)::BIGINT AS n
                  FROM w GROUP BY 1, 2),
            tot AS (SELECT source, SUM(n)::DOUBLE AS N FROM c GROUP BY 1),
            srcs AS (SELECT DISTINCT source FROM c),
            pairs AS (SELECT a.source AS sa, b.source AS sb
                      FROM srcs a JOIN srcs b ON a.source < b.source),
            u AS (SELECT p.sa, p.sb, c.word
                  FROM pairs p JOIN c ON c.source IN (p.sa, p.sb)
                  GROUP BY 1, 2, 3),
            j AS (SELECT u.sa, u.sb,
                         COALESCE(ca.n, 0) / ta.N AS pa,
                         COALESCE(cb.n, 0) / tb.N AS pb
                  FROM u
                  JOIN tot ta ON ta.source = u.sa
                  JOIN tot tb ON tb.source = u.sb
                  LEFT JOIN c ca ON ca.source = u.sa AND ca.word = u.word
                  LEFT JOIN c cb ON cb.source = u.sb AND cb.word = u.word)
            SELECT sa AS source_a, sb AS source_b,
                   round(SUM(
                       CASE WHEN pa + pb > 0
                            THEN -((pa + pb) / 2) * ln((pa + pb) / 2)
                            ELSE 0 END
                       + (CASE WHEN pa > 0 THEN pa * ln(pa) ELSE 0 END
                          + CASE WHEN pb > 0 THEN pb * ln(pb) ELSE 0 END)
                         / 2), 6) AS jsd
            FROM j GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # per-source exact-dup scorecard: distinct md5(text) vs docs
        "source_dup_rate": """
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   COUNT(DISTINCT md5(text))::BIGINT AS n_distinct,
                   round(1 - COUNT(DISTINCT md5(text))::DOUBLE
                         / COUNT(*), 6) AS dup_rate
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        # schema-on-read JSON extraction, aggregated per event type
        # regexp_extract + TRY_CAST mirrors the engine's strict-integer
        # regex EXACTLY on dirty rows: '{"k": 3.5}' and non-JSON both
        # yield NULL on BOTH sides (plain CAST would crash DuckDB on
        # bad JSON, and TRY_CAST of json_extract_string('3.5') ROUNDS
        # to 4 — both diverge from the engine's null-skip contract)
        "props_extract_stats": r"""
            WITH k_vals AS (
                SELECT event_type,
                       TRY_CAST(regexp_extract(
                           props, '"k"\s*:\s*(-?\d+)\s*[,}]', 1
                       ) AS BIGINT) AS k
                FROM events
            )
            SELECT event_type,
                   COUNT(*)::BIGINT AS n_events,
                   SUM(k)::BIGINT AS sum_k,
                   MIN(k)::BIGINT AS min_k,
                   MAX(k)::BIGINT AS max_k
            FROM k_vals GROUP BY event_type ORDER BY event_type
        """,
        # range join via bucketized interval replication: clicks in
        # the half-open hour before each purchase, LEFT semantics
        "events_range_join": """
            SELECT p.event_id,
                   COUNT(c.event_id)::BIGINT AS n_prior_clicks
            FROM events p
            LEFT JOIN events c
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id ORDER BY p.event_id
        """,
        # TPC-H Q5 shape: dimension chain folded to broadcast maps,
        # orders ⋈ lineitem size-adaptive; per-element c4 rounding
        # makes the revenue sum order-independent
        "regional_revenue": """
            SELECT n_name,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                                  + 0.5) AS BIGINT))::BIGINT AS revenue_c4
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY n_name ORDER BY revenue_c4 DESC, n_name
        """,
        "part_type_stats": """
            SELECT p_type,
                   COUNT(*)::BIGINT AS n_parts,
                   MAX(p_size)::BIGINT AS max_size,
                   SUM(CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT))::BIGINT AS sum_price_cents
            FROM part GROUP BY 1 ORDER BY 1
        """,
        "user_sessions": """
            SELECT user_id::BIGINT AS user_id,
                   COUNT(*)::BIGINT AS n_events,
                   (1 + SUM(CASE WHEN prev_ts IS NOT NULL
                                      AND ts - prev_ts > INTERVAL 30 MINUTE
                                 THEN 1 ELSE 0 END))::BIGINT AS n_sessions
            FROM (SELECT user_id, ts,
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                  FROM events)
            GROUP BY user_id ORDER BY user_id
        """,
        "txt_chunk_roundtrip": f"""
            SELECT doc_id,
                   regexp_replace(text, '{_TXT_DELIMS}', '', 'g') AS extracted
            FROM documents ORDER BY doc_id
        """,
        "html_extract_roundtrip": """
            SELECT doc_id, text AS extracted FROM documents ORDER BY doc_id
        """,
        # independent re-derivation fixture
        # independent re-derivation fixture (tools/make_bpe_fixture.py
        # — naive pure-Python Sennrich BPE, no ragflow_ray imports)
        "bpe_train": f"""
            SELECT step, "left", "right", n
            FROM read_parquet('{_FIXTURES}/bpe_merges.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY step
        """,
        "bpe_encode": f"""
            SELECT doc_id, n_tokens_bpe, sig
            FROM read_parquet('{_FIXTURES}/bpe_encode.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY doc_id
        """,
        # (tools/make_pdfblocks_fixture.py — self-contained naive
        # sequential implementation of the pdf __call__ composition,
        # no ragflow_ray pipeline imports)
        "pdf_text_blocks": f"""
            SELECT doc_id, n_blocks, n_chars
            FROM read_parquet('{_FIXTURES}/pdf_text_blocks.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY doc_id
        """,
        # pinned-golden fixture (tools/make_extract_fixtures.py): the
        # full 15-family chunker sweep is not SQL-expressible and too
        # wide for an independent re-derivation; the fixture freezes a
        # known-good output so any chunker/parser regression flips the
        # driver row
        "extract_all_templates": f"""
            SELECT doc_id, template, n_spans, n_chars
            FROM read_parquet('{_FIXTURES}/corpus_extract.parquet')
            WHERE corpus_key = (SELECT SUM(n_chars) FROM documents)
            ORDER BY doc_id
        """,
        # clustering: independent naive Lloyd + greedy-sweep
        # re-derivation (tools/make_cluster_fixtures.py)
        "kmeans_clusters": f"""
            SELECT vec_id, cluster, cluster_size
            FROM read_parquet('{_FIXTURES}/kmeans_clusters.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY vec_id
        """,
        "semdedup": f"""
            SELECT vec_id, cluster, keep, dup_of
            FROM read_parquet('{_FIXTURES}/semdedup.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY vec_id
        """,
        # product-quantization ADC top-k: independent re-derivation of
        # the codebook Lloyd + table-lookup scoring spec
        # (tools/make_pq_fixture.py)
        "ann_pq_topk": f"""
            SELECT q_vec_id, vec_id, rank
            FROM read_parquet('{_FIXTURES}/pq_topk.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY q_vec_id, rank
        """,
        # RAPTOR-style two-level tree: independent naive re-derivation
        # (tools/make_raptor_fixture.py) of the global+local Lloyd spec
        "raptor_tree": f"""
            SELECT vec_id, l0, l1, leaf_size
            FROM read_parquet('{_FIXTURES}/raptor_tree.parquet')
            WHERE corpus_key = (
                SELECT SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5)
                               AS BIGINT))
                FROM embeddings)
            ORDER BY vec_id
        """,
        # DSIR hashed-unigram importance weights: the bucket spec is
        # the md5-hex idiom shared with mixture_sample; weights via ln
        # on add-one-smoothed bucket models, sum rounded to 6 dp (the
        # lm_cross_entropy float-absorb convention)
        "dsir_importance": f"""
            WITH words AS (
                SELECT doc_id, lang,
                       unnest(regexp_extract_all(text, '{_NTOK_RUN}')) AS w
                FROM documents
            ),
            bw AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                           % {_DSIR_B} AS b
                FROM words
            ),
            cnt AS (
                SELECT b,
                       SUM(CASE WHEN lang = '{_DSIR_LANG}' THEN 1 ELSE 0 END) AS t,
                       COUNT(*) AS r
                FROM bw GROUP BY b
            ),
            tot AS (SELECT SUM(t) AS bt, SUM(r) AS br FROM cnt),
            wt AS (
                SELECT b,
                       ln((t + 1.0) / (bt + {_DSIR_B}.0))
                         - ln((r + 1.0) / (br + {_DSIR_B}.0)) AS w
                FROM cnt, tot
            ),
            doc_b AS (
                SELECT doc_id, b, COUNT(*) AS c FROM bw GROUP BY doc_id, b
            )
            SELECT doc_id::BIGINT AS doc_id,
                   round(SUM(c * w), 6) AS dsir_logw
            FROM doc_b JOIN wt USING (b)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # ROLLUP: all three levels pre-aggregated per batch in one
        # pass; '*' spells the ALL bucket
        "source_lang_rollup": f"""
            SELECT COALESCE(source, '*') AS source,
                   COALESCE(lang, '*') AS lang,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM({_NTOK})::BIGINT AS n_tokens
            FROM documents
            GROUP BY ROLLUP (source, lang)
            ORDER BY source, lang
        """,
        # Gopher quality rules (Rae et al. 2021 A1.1): x100/x1000
        # fixed-point floors so both sides are integer-exact; line trim
        # and token classes are the repo's ASCII-explicit conventions
        "gopher_quality_flags": rf"""
            WITH lines AS (
                SELECT doc_id,
                       trim(l, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS sl
                FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                      FROM documents)
            ),
            lstats AS (
                SELECT doc_id, COUNT(*) AS n_lines,
                       SUM(CASE WHEN sl LIKE '-%' OR sl LIKE '•%'
                                  OR sl LIKE '*%' THEN 1 ELSE 0 END) AS bullet,
                       SUM(CASE WHEN sl LIKE '%...' OR sl LIKE '%…'
                           THEN 1 ELSE 0 END) AS ellipsis
                FROM lines GROUP BY doc_id
            ),
            dstats AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS n_words,
                       len(regexp_replace(text, '[ \t\n\r\f\v]+', '', 'g')) AS nonws,
                       len(regexp_extract_all(text, '#'))
                           + len(regexp_extract_all(text, '\.\.\.')) AS n_symbols
                FROM documents
            )
            SELECT d.doc_id,
                   n_words::BIGINT AS n_words,
                   (nonws * 100 // greatest(n_words, 1))::BIGINT AS mean_wordlen_x100,
                   (bullet * 1000 // greatest(n_lines, 1))::BIGINT AS bullet_lines_x1000,
                   (ellipsis * 1000 // greatest(n_lines, 1))::BIGINT AS ellipsis_lines_x1000,
                   (n_symbols * 1000 // greatest(n_words, 1))::BIGINT AS symbol_ratio_x1000,
                   (CASE WHEN n_words BETWEEN {curation_mod.GOPHER_MIN_WORDS}
                                          AND {curation_mod.GOPHER_MAX_WORDS}
                          AND (nonws * 100 // greatest(n_words, 1))
                              BETWEEN {curation_mod.GOPHER_MIN_WORDLEN_X100}
                                  AND {curation_mod.GOPHER_MAX_WORDLEN_X100}
                          AND bullet * 1000 // greatest(n_lines, 1)
                              <= {curation_mod.GOPHER_MAX_BULLET_X1000}
                          AND ellipsis * 1000 // greatest(n_lines, 1)
                              <= {curation_mod.GOPHER_MAX_ELLIPSIS_X1000}
                          AND n_symbols * 1000 // greatest(n_words, 1)
                              <= {curation_mod.GOPHER_MAX_SYMBOL_X1000}
                     THEN 1 ELSE 0 END)::BIGINT AS gopher_keep
            FROM dstats d JOIN lstats USING (doc_id)
            ORDER BY d.doc_id
        """,
        # ordered-sequence funnel: chained strictly-after first-step
        # minima per user (view -> click -> purchase)
        "user_funnel": """
            WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
                       WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, MIN(e.ts) AS t
                  FROM events e JOIN v USING (user_id)
                  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1),
            p AS (SELECT e.user_id, MIN(e.ts) AS t
                  FROM events e JOIN c USING (user_id)
                  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1)
            SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_view,
                   (SELECT COUNT(*) FROM c)::BIGINT AS n_view_click,
                   (SELECT COUNT(*) FROM p)::BIGINT
                       AS n_view_click_purchase
        """,
        # cross-source contamination: distinct shared 8-grams per
        # source pair (md5 digests on both sides, same equality)
        # cross-split 8-gram leakage; the split label re-derives from
        # md5(text) exactly as stratified_split assigns it
        "split_leakage": """
            WITH base AS (
                SELECT CASE WHEN CAST(('0x' || substr(md5(text), 1, 8))
                                      AS BIGINT) % 1000 < 900
                            THEN 'train'
                            WHEN CAST(('0x' || substr(md5(text), 1, 8))
                                      AS BIGINT) % 1000 < 950
                            THEN 'val' ELSE 'test' END AS split,
                       string_split(text, ' ') AS ws
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT split, g FROM (
                    SELECT split,
                           unnest(CASE WHEN len(ws) < 8
                                  THEN [md5(array_to_string(ws, ' '))]
                                  ELSE list_distinct(list_transform(
                                       range(len(ws) - 7),
                                       i -> md5(array_to_string(
                                            list_slice(ws, i + 1, i + 8), ' '))))
                                  END) AS g
                    FROM base)
            )
            SELECT a.split AS split_a, b.split AS split_b,
                   COUNT(*)::BIGINT AS n_shared_grams
            FROM sh a JOIN sh b ON a.g = b.g AND a.split < b.split
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "source_overlap_matrix": """
            WITH base AS (
                SELECT source, string_split(text, ' ') AS ws FROM documents
            ),
            sh AS (
                SELECT DISTINCT source, g FROM (
                    SELECT source,
                           unnest(CASE WHEN len(ws) < 8
                                  THEN [md5(array_to_string(ws, ' '))]
                                  ELSE list_distinct(list_transform(
                                       range(len(ws) - 7),
                                       i -> md5(array_to_string(
                                            list_slice(ws, i + 1, i + 8), ' '))))
                                  END) AS g
                    FROM base)
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   COUNT(*)::BIGINT AS n_shared_grams
            FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Gopher repetition rules: duplicate-line fractions + the char
        # fraction of the most frequent word 2-/3-gram (tie-break:
        # max count, then max count·len — both sides)
        "gopher_repetition_flags": rf"""
            WITH lines AS (
                SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                FROM documents
            ),
            lg AS (
                SELECT doc_id, l, COUNT(*) AS cnt, len(l) AS chars
                FROM lines GROUP BY doc_id, l
            ),
            lstat AS (
                SELECT doc_id,
                       SUM(cnt) AS n_lines,
                       SUM(cnt - 1) AS dup_lines,
                       SUM((cnt - 1) * chars) AS dup_chars,
                       greatest(SUM(cnt * chars), 1) AS tot_chars
                FROM lg GROUP BY doc_id
            ),
            ws AS (
                SELECT doc_id,
                       regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS w,
                       greatest(len(text), 1) AS tlen
                FROM documents
            ),
            g2c AS (
                SELECT doc_id, g, COUNT(*) AS cnt FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(greatest(len(w) - 1, 0)),
                                  i -> w[i+1] || ' ' || w[i+2])) AS g
                    FROM ws) GROUP BY doc_id, g
            ),
            g3c AS (
                SELECT doc_id, g, COUNT(*) AS cnt FROM (
                    SELECT doc_id,
                           unnest(list_transform(range(greatest(len(w) - 2, 0)),
                                  i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
                    FROM ws) GROUP BY doc_id, g
            ),
            g2top AS (
                SELECT doc_id, MAX(cnt * len(g)) AS top2 FROM (
                    SELECT doc_id, g, cnt,
                           MAX(cnt) OVER (PARTITION BY doc_id) AS mx
                    FROM g2c) WHERE cnt = mx GROUP BY doc_id
            ),
            g3top AS (
                SELECT doc_id, MAX(cnt * len(g)) AS top3 FROM (
                    SELECT doc_id, g, cnt,
                           MAX(cnt) OVER (PARTITION BY doc_id) AS mx
                    FROM g3c) WHERE cnt = mx GROUP BY doc_id
            )
            SELECT w.doc_id,
                   (dup_lines * 1000 // greatest(n_lines, 1))::BIGINT
                       AS dup_line_x1000,
                   (dup_chars * 1000 // tot_chars)::BIGINT
                       AS dup_line_char_x1000,
                   (COALESCE(top2, 0) * 1000 // tlen)::BIGINT
                       AS top2gram_char_x1000,
                   (COALESCE(top3, 0) * 1000 // tlen)::BIGINT
                       AS top3gram_char_x1000,
                   (CASE WHEN dup_lines * 1000 // greatest(n_lines, 1)
                              <= {curation_mod.REP_MAX_DUP_LINE_X1000}
                          AND dup_chars * 1000 // tot_chars
                              <= {curation_mod.REP_MAX_DUP_LINE_CHAR_X1000}
                          AND COALESCE(top2, 0) * 1000 // tlen
                              <= {curation_mod.REP_MAX_TOP2GRAM_X1000}
                          AND COALESCE(top3, 0) * 1000 // tlen
                              <= {curation_mod.REP_MAX_TOP3GRAM_X1000}
                     THEN 1 ELSE 0 END)::BIGINT AS repetition_keep
            FROM ws w
            JOIN lstat USING (doc_id)
            LEFT JOIN g2top USING (doc_id)
            LEFT JOIN g3top USING (doc_id)
            ORDER BY w.doc_id
        """,
        # C4 line filter: keep lines ending in terminal punctuation
        # ('' inside the SQL literal = one apostrophe)
        "c4_line_filter": """
            WITH lines AS (
                SELECT doc_id,
                       trim(l, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) AS sl
                FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                      FROM documents)
            )
            SELECT doc_id, COUNT(*)::BIGINT AS n_lines,
                   SUM(CASE WHEN sl LIKE '%.' OR sl LIKE '%!' OR sl LIKE '%?'
                              OR sl LIKE '%"' OR sl LIKE '%'''
                       THEN 1 ELSE 0 END)::BIGINT AS n_kept_lines,
                   SUM(CASE WHEN sl LIKE '%.' OR sl LIKE '%!' OR sl LIKE '%?'
                              OR sl LIKE '%"' OR sl LIKE '%'''
                       THEN len(sl) ELSE 0 END)::BIGINT AS kept_chars
            FROM lines GROUP BY doc_id ORDER BY doc_id
        """,
        # UniMax temperature mixture: rate_s = min(S, B·S·w_s//(W·n_s)),
        # w_s = floor(sqrt(n_s)) (IEEE sqrt is correctly rounded, so
        # both sides agree bit-for-bit); same md5 content-hash gate
        "temperature_mix": f"""
            WITH n AS (SELECT source, COUNT(*) AS n_s FROM documents
                       GROUP BY source),
            w AS (SELECT source, n_s,
                         CAST(FLOOR(sqrt(n_s)) AS BIGINT) AS w_s FROM n),
            tot AS (SELECT SUM(w_s) AS w_total,
                           SUM(n_s) // {curation_mod.TMIX_BUDGET_HALF} AS budget
                    FROM w),
            rate AS (
                SELECT source,
                       LEAST({curation_mod.TMIX_SCALE},
                             (budget * {curation_mod.TMIX_SCALE} * w_s)
                                 // (w_total * n_s)) AS r
                FROM w, tot
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN rate USING (source)
            WHERE CAST(('0x' || substr(md5(d.text), 1, 8)) AS BIGINT)
                      % {curation_mod.TMIX_SCALE} < rate.r
            ORDER BY d.doc_id
        """,
        # hashed-unigram multinomial Naive Bayes: integer-quantized
        # log weights (floor(1e6·ln) — math.log and DuckDB ln share
        # the platform libm) make the argmax bit-exact; ties break to
        # the ascending language; token-less docs skipped (dsir
        # convention)
        "nb_lang_classify": f"""
            WITH words AS (
                SELECT doc_id, lang,
                       unnest(regexp_extract_all(text, '{_NTOK_RUN}')) AS w
                FROM documents
            ),
            bw AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                           % {_NBC_B} AS b
                FROM words
            ),
            cnt AS (SELECT lang, b, COUNT(*) AS n FROM bw GROUP BY lang, b),
            ltot AS (SELECT lang, COUNT(*) AS tot FROM bw GROUP BY lang),
            prior AS (
                SELECT lang,
                       CAST(FLOOR({_NBC_S} * ln(COUNT(*) * 1.0 /
                            (SELECT COUNT(*) FROM documents))) AS BIGINT) AS pq
                FROM documents GROUP BY lang
            ),
            doc_b AS (SELECT doc_id, b, COUNT(*) AS c FROM bw
                      GROUP BY doc_id, b),
            scores AS (
                SELECT d.doc_id, p.lang,
                       MAX(p.pq) + SUM(d.c * CAST(FLOOR({_NBC_S} *
                           ln((COALESCE(cnt.n, 0) + 1.0) /
                              (COALESCE(lt.tot, 0) + {_NBC_B}.0)))
                           AS BIGINT)) AS s
                FROM doc_b d
                CROSS JOIN prior p
                LEFT JOIN ltot lt ON lt.lang = p.lang
                LEFT JOIN cnt ON cnt.lang = p.lang AND cnt.b = d.b
                GROUP BY d.doc_id, p.lang
            )
            SELECT s.doc_id, s.lang AS pred_lang, s.s::BIGINT AS score_q,
                   (CASE WHEN s.lang = doc.lang THEN 1 ELSE 0 END)::BIGINT
                       AS correct
            FROM scores s JOIN documents doc USING (doc_id)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                       ORDER BY s.s DESC, s.lang) = 1
            ORDER BY s.doc_id
        """,
        # content-hash split gate: same md5 idiom; duplicate texts
        # always share a split (leak safety)
        "stratified_split": f"""
            SELECT source,
                   CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                             % {_SPLIT_MOD} < {_SPLIT_TRAIN} THEN 'train'
                        WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                             % {_SPLIT_MOD} < {_SPLIT_VAL} THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*)::BIGINT AS n_docs,
                   SUM({_NTOK})::BIGINT AS n_tokens
            FROM documents
            GROUP BY source, split ORDER BY source, split
        """,
        # tf·idf with idf = ln((N+1)/(df+1)); score rounded to 6 dp
        # BEFORE ranking, ties broken term-ascending (engine spec)
        "tfidf_top_terms": f"""
            WITH words AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(text, '{_NTOK_RUN}')) AS w
                FROM documents
            ),
            tf AS (
                SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w
            ),
            df AS (
                SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w
            ),
            n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT doc_id, w,
                       round(tf * ln((n + 1.0) / (df + 1.0)), 6) AS s
                FROM tf JOIN df USING (w), n
            ),
            ranked AS (
                SELECT doc_id, w, s,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY s DESC, w) AS rank
                FROM scored
            )
            SELECT doc_id::BIGINT AS doc_id, rank::BIGINT AS rank,
                   w AS term, s AS tfidf_r6
            FROM ranked WHERE rank <= {_TFIDF_K}
            ORDER BY doc_id, rank
        """,
        **_template_oracles(),
        **_tokenize_oracles(),
    }
    # recall@k of the approximate ANN variants against the brute-force
    # ground truth — composed from the three component oracles so the
    # eval can never drift from what it evaluates
    oracles["ann_recall"] = f"""
        WITH brute AS ({oracles["ann_topk"]}),
        ivf AS ({oracles["ann_ivf_topk"]}),
        lsh AS ({oracles["ann_lsh_topk"]})
        SELECT b.q_vec_id::BIGINT AS q_vec_id,
               COUNT(i.vec_id)::BIGINT AS ivf_hits,
               round(COUNT(i.vec_id) / 10.0, 6) AS ivf_recall,
               COUNT(l.vec_id)::BIGINT AS lsh_hits,
               round(COUNT(l.vec_id) / 10.0, 6) AS lsh_recall
        FROM brute b
        LEFT JOIN ivf i ON i.q_vec_id = b.q_vec_id
                       AND i.vec_id = b.vec_id
        LEFT JOIN lsh l ON l.q_vec_id = b.q_vec_id
                       AND l.vec_id = b.vec_id
        GROUP BY 1 ORDER BY 1
    """
    return oracles


def _tokenize_oracles() -> dict[str, str]:
    from ragflow_ray.ops.tokenize import oracle_sql as tokenize_sql

    return tokenize_sql()


def _template_oracles() -> dict[str, str]:
    from ragflow_ray.ops.template_roundtrips import oracle_sql as template_sql

    return template_sql()
