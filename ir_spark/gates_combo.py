"""Tagged-union combo gates — pack stable operator families into one
registry entry each so EVERY operator earns a driver-green oracle row
EVERY round.

Why: the per-round driver verifies at most ~50 registry entries
(round 2: 73 registered -> exactly the first 50 checked), so a registry
larger than the window structurally leaves gates unverified each round
(VERDICT r2 "What's wrong" #1).  Consolidating the long-stable families
below brings the registry back under the window WITHOUT weakening the
check: a combo emits the UNION of its components' rows, each row tagged
with its component gate name and its full column tuple serialized into
one string, and the DuckDB oracle is the UNION ALL of the components'
oracles under the identical serialization.  A value-hash match on the
combo therefore proves every component's exact values, just as the
standalone gates did — the only thing lost is per-component schema
typing, which `_norm_spark` re-asserts against the frozen COMBO_SPECS
column lists (a component schema drift fails loudly, not silently).

Serialization contract (must be bit-identical across engines):
  - columns in sorted(name) order;
  - every value CAST to string — both engines print integral types as
    plain digits and these gates emit only string / int / bigint
    columns (floats are already micro-quantized longs by gate
    convention, r1 lesson);
  - NULL -> the sentinel U+2205 (never a real value in these gates);
  - joined with '|'.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_TOKEN = "∅"

# combo -> {component gate: frozen sorted column list}.  Regenerate a
# row with sorted(df.columns) if a component's schema legitimately
# changes; the runtime assert in _norm_spark catches accidental drift.
COMBO_SPECS: dict[str, dict[str, list[str]]] = {
    "resultpage_suite": {
        "facet_counts": ["lang", "n_docs"],
        "significant_terms": ["bg_df", "fg_df", "score_micro", "term"],
        "snippet_extract": ["doc_id", "pos", "snippet", "term"],
        "snippet_best_window": ["doc_id", "n_terms", "score_micro",
                                "win_start"],
        "date_histogram": ["bucket", "bucket_start_day", "n_docs"],
    },
    "positions_suite": {
        "phrase_match": ["doc_id", "phrase_tf"],
        "proximity_match": ["doc_id", "min_dist"],
        "sloppy_phrase": ["doc_id", "min_gap"],
        "span_near_ordered": ["doc_id", "min_span"],
        "span_near_unordered": ["doc_id", "min_span"],
        "bm25_phrase_boost_topk": ["doc_id", "score_micro"],
    },
    # r3's 22-component scoring_suite is split in two (VERDICT r4 item
    # 5): one flaky component no longer voids 21 others' evidence for a
    # round, and each half benches independently.  scoring_suite keeps
    # the retrieval-MODEL family (one weighting formula per component);
    # retrieval_ops_suite carries the serving/eval machinery (shards,
    # impact SAAT, QPP, interleaving, rank metrics).
    "scoring_suite": {
        "w1_topk": ["doc_id", "score_micro"],
        "w2_topk": ["doc_id", "score_micro"],
        "lmjm_topk": ["doc_id", "score_micro"],
        "pl2_topk": ["doc_id", "score_micro"],
        "bm25plus_topk": ["doc_id", "score_micro"],
        "pivoted_topk": ["doc_id", "score_micro"],
        "querybox_topk": ["doc_id", "score_micro"],
        "bm25l_topk": ["doc_id", "score_micro"],
        "sdm_topk": ["doc_id", "score_micro"],
        "dismax_topk": ["doc_id", "score_micro"],
        "rocchio_topk": ["doc_id", "score_micro"],
        "bm25_topk_upsert": ["doc_id", "score_micro"],
    },
    "retrieval_ops_suite": {
        "sharded_bm25_topk": ["doc_id", "score_micro"],
        "sharded_pruned_bm25_topk": ["doc_id", "score_micro"],
        "impact_bm25_topk": ["doc_id", "score_micro"],
        "impact_pruned_bm25_topk": ["doc_id", "score_micro"],
        "clarity_scores": ["clarity_micro", "n_model_terms", "query_id"],
        "qpp_wig_nqc": ["corpus_micro", "k_used", "n_terms", "nqc_nano",
                        "query_id", "wig_micro"],
        "tdi_interleave": ["doc_id", "pos", "query_id", "team"],
        "tdi_credit": ["clicks_a", "clicks_b", "query_id", "winner"],
        "rank_rbo": ["overlap_at_k", "query_id", "rbo_micro"],
        "cori_shards": ["belief_nano", "cw", "n_terms", "shard_id"],
    },
    "lexicon_suite": {
        "synonym_bm25_topk": ["doc_id", "score_micro"],
        "spell_suggest": ["df", "dist", "term"],
        "phrase_suggest": ["dist", "original", "pos", "score_micro",
                           "suggested"],
        "spellfix_bm25_topk": ["doc_id", "score_micro"],
        "bm25_msm_topk": ["doc_id", "score_micro"],
        "prefix_terms": ["df", "term"],
        "wildcard_terms": ["df", "term"],
        "substring_terms": ["df", "term"],
        "regex_terms": ["df", "term"],
        "fuzzy_terms": ["df", "dist", "term"],
        "selective_prf_topk": ["doc_id", "expanded", "query_id",
                               "score_micro"],
    },
    "textstats_suite": {
        "lang_id": ["doc_id", "lang_pred", "stop_ratio_micro"],
        "quality_score": ["doc_id", "keep", "mean_token_len_micro",
                          "n_tokens", "stop_ratio_micro", "ttr_micro"],
        "token_stats": ["doc_id", "n_chars", "n_chunks", "n_ws_tokens"],
        "pretoken_stats": ["doc_id", "n_alpha", "n_num", "n_pretokens",
                           "n_punct"],
        "doc_fingerprint": ["doc_id", "min_gram_md5", "n_distinct_grams"],
        "token_quantiles": ["lang", "n_docs", "p25_micro", "p50_micro",
                            "p75_micro", "p95_micro"],
        "vocab_growth": ["n_docs", "n_tokens", "vocab_size"],
        "lm_perplexity": ["doc_id", "keep", "n_bigrams", "nll_micro"],
        "pii_scrub": ["doc_id", "n_emails", "n_ips", "n_phones",
                      "scrubbed_md5"],
        "collocations_pmi": ["n", "pmi_micro", "w1", "w2"],
        "cms_term_counts": ["est", "term", "true_cf"],
        "bloom_dictionary": ["might_contain", "term"],
        "hll_registers": ["bucket", "register"],
        "unicode_nfc": ["bytes_after", "bytes_before", "doc_id",
                        "norm_md5", "was_nfc"],
        "cjk_bigrams": ["doc_id", "term", "tf"],
    },
    "dedup_suite": {
        "dedup_exact": ["max_doc_id", "min_doc_id", "n_copies", "text_md5"],
        "minhash_bands": ["band", "band_hash", "doc_id"],
        "lsh_near_dup_pairs": ["a", "b", "jaccard_micro"],
        "simhash": ["doc_id", "simhash"],
        "ngram_jaccard_pairs": ["a", "b", "jaccard_micro"],
        "dup_span_coverage": ["covered_tokens", "doc_id",
                              "dup_token_frac_micro", "n_dup_positions",
                              "n_grams", "n_tokens"],
        "dedup_clusters": ["cluster_id", "doc_id", "is_canonical"],
        "paragraph_dedup": ["doc_id", "kept_md5", "n_kept", "n_paras"],
        "simhash_near_dup": ["a", "b", "dist"],
    },
    "corpus_suite": {
        "gopher_quality": ["alpha_frac_micro", "bullet_line_frac_micro",
                           "doc_id", "ellipsis_line_frac_micro",
                           "ellipsis_ratio_micro", "hash_ratio_micro",
                           "keep", "mean_word_len_micro", "n_stop_kinds",
                           "n_words"],
        "decontaminate": ["contaminated", "doc_id", "n_contaminated_grams",
                          "n_grams"],
        "decontaminate_bloom": ["contaminated", "doc_id", "n_bloom_hits",
                                "n_grams"],
        "repetition_filter": ["doc_id", "dup_trigram_frac_micro", "keep",
                              "top_bigram_frac_micro"],
        "stratified_sample": ["doc_id", "lang", "sample_key_micro"],
        "weighted_sample": ["doc_id", "sample_key_micro"],
        "host_profile": ["dup_frac_micro", "host", "mean_tokens_micro",
                         "n_docs", "n_dup_docs", "top_lang"],
        "mix_report": ["lang", "n_chars", "n_docs", "n_tokens",
                       "token_share_micro"],
        "host_cap_sample": ["doc_id", "host_rank", "source"],
        "sequence_pack": ["bin_id", "bin_offset", "doc_id", "n_tokens",
                          "start"],
        "dsir_weights": ["doc_id", "dsir_logw_micro"],
        "corpus_drift": ["jsd_bits_micro", "n_slice_tokens", "slice"],
        "host_boilerplate": ["doc_id", "kept_md5", "n_boiler", "n_paras"],
        "nb_lang_classify": ["doc_id", "mean_ll_micro", "pred_lang"],
        "passage_bm25_topk": ["chunk_id", "doc_id", "score_micro",
                              "start"],
        "doc_chunks": ["chunk_id", "chunk_md5", "doc_id",
                       "n_chunk_tokens", "start"],
        "c4_line_filter": ["doc_id", "keep", "kept_md5",
                           "n_kept_lines", "n_lines"],
    },
    "ann_suite": {
        "ann_cosine_topk": ["score_micro", "vec_id"],
        "ann_ivf_topk": ["score_micro", "vec_id"],
        "ann_ivf_index_topk": ["score_micro", "vec_id"],
        "ann_pq_topk": ["score_micro", "vec_id"],
        "ann_pq_refined_topk": ["score_micro", "vec_id"],
        "embedding_near_dup": ["a", "b", "cosine_micro"],
        "srp_near_dup": ["a", "b", "dist"],
        "hybrid_rrf_topk": ["doc_id", "rank", "rrf_micro"],
        "hybrid_combmnz_topk": ["doc_id", "fused_micro", "rank"],
        "ann_mmr_topk": ["obj_micro", "sel_rank", "vec_id"],
    },
    "linkgraph_suite": {
        "pagerank_hosts": ["node", "rank_micro"],
        "trustrank_hosts": ["node", "trust_micro"],
        "host_reciprocity": ["host", "n_out", "n_reciprocal",
                             "recip_frac_micro"],
        "hits_hosts": ["auth_micro", "hub_micro", "node"],
        "anchor_text_agg": ["anchor_terms", "dst", "n_inlinks",
                            "n_src_hosts"],
        "url_canonical_dedup": ["canon_url", "doc_id", "n_dups"],
        "bm25_pagerank_topk": ["doc_id", "score_micro"],
        "bm25_diverse_topk": ["doc_id", "host_rank", "score_micro",
                              "source"],
        "bm25_collapse_topk": ["doc_id", "score_micro", "source"],
        "robots_rules": ["allow", "host", "rule_path"],
        "robots_allowed": ["allowed", "doc_id", "matched_path"],
        "crawl_frontier": ["doc_id", "eta_ms", "host", "host_rank"],
        "sitemap_urls": ["host", "lastmod", "url"],
        "revisit_change_rate": ["change_rate_micro", "n_captures",
                                "n_changes", "url"],
    },
    "multimodal_suite": {
        "warc_roundtrip": ["html_md5", "ts_epoch", "url"],
        "multimodal_png_pixels": ["channels", "doc_id", "height",
                                  "max_px", "mean_b_micro", "mean_g_micro",
                                  "mean_r_micro", "min_px", "width"],
        "multimodal_meta": ["doc_id", "format", "height", "n_bytes",
                            "width"],
        "multimodal_image_meta": ["doc_id", "format", "height", "n_bytes",
                                  "width"],
        "multimodal_wav_stats": ["doc_id", "duration_us", "n_bytes",
                                 "n_samples", "peak", "rms_micro",
                                 "sample_rate", "zero_crossings"],
        "multimodal_features": ["doc_id", "feature_micro", "pos"],
        "frame_sample": ["byte_offset", "doc_id", "frame_no"],
    },
    "events_suite": {
        "events_tumbling": ["event_type", "n_events", "sum_value_micro",
                            "window_start_us"],
        "events_sliding": ["event_type", "n_events", "window_start_us"],
        "events_sessions": ["n_events", "session_end_us", "session_id",
                            "session_start_us", "user_id"],
        "events_json_props": ["event_type", "max_k", "min_k", "n",
                              "sum_k"],
        "trending_terms": ["n", "rank", "term", "window_start_us"],
        "event_attribution": ["click_id", "lag_us", "purchase_id"],
        "percolate_match": ["doc_id", "n_matched", "n_terms", "query_id"],
    },
}

COMBO_SCHEMA_NOTE = "gate:string,row:string"


def _norm_spark(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    actual = sorted(df.columns)
    if actual != cols:
        raise AssertionError(
            f"combo component {name!r} schema drifted: expected {cols}, "
            f"got {actual} — update COMBO_SPECS in lockstep")
    return df.select(
        F.lit(name).alias("gate"),
        F.concat_ws("|", *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_TOKEN))
            for c in cols
        ]).alias("row"))


def _make_combo_fn(spec: dict[str, list[str]],
                   qreg: dict[str, Callable]) -> Callable:
    comps = {c: qreg[c] for c in spec}

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for c, f in comps.items():
            part = _norm_spark(f(spark, sf_dir), c, spec[c])
            out = part if out is None else out.unionByName(part)
        return out

    return fn


def _norm_sql(name: str, cols: list[str], sql: str) -> str:
    exprs = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{NULL_TOKEN}')" for c in cols)
    return (f"SELECT '{name}' AS gate, concat_ws('|', {exprs}) AS row "
            f"FROM (\n{sql}\n) _sub_{name}")


def combine(qreg: dict[str, Callable],
            sqlreg: dict[str, str]) -> tuple[dict, dict]:
    """Replace every COMBO_SPECS component in (queries, oracle_sql) with
    its combo entry.  A combo whose components are ALL missing from the
    registries is skipped wholesale — component_registries() degrades
    by dropping whole modules on ImportError, and a bare del/KeyError
    here would turn that graceful degradation into a total registry
    failure.  A PARTIALLY-present combo is still a hard error: specs
    and gate modules must move in lockstep."""
    q2, s2 = dict(qreg), dict(sqlreg)
    for combo, spec in COMBO_SPECS.items():
        # presence requires BOTH registries: a component in qreg but
        # not sqlreg (or vice versa) must hit the descriptive lockstep
        # error below, not a bare KeyError from the del
        present = [c for c in spec if c in qreg and c in sqlreg]
        if not present and not any(c in qreg or c in sqlreg for c in spec):
            continue  # whole module absent (graceful degradation)
        if len(present) != len(spec):
            missing = sorted(c for c in spec
                             if c not in qreg or c not in sqlreg)
            raise KeyError(
                f"combo {combo!r}: components missing from the queries "
                f"and/or oracle-SQL registry (specs and gate modules "
                f"must move in lockstep): {missing}")
        for c in spec:
            del q2[c]
            del s2[c]
        q2[combo] = _make_combo_fn(spec, qreg)
        s2[combo] = "\nUNION ALL\n".join(
            _norm_sql(c, spec[c], sqlreg[c]) for c in spec)
    return q2, s2


def combo_components() -> dict[str, str]:
    """component gate -> combo name (for coverage docs / tests)."""
    return {c: combo for combo, spec in COMBO_SPECS.items() for c in spec}
