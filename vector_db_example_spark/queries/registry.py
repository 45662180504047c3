"""Registry plumbing for the query inventory."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    #: Equivalent DuckDB SQL over the pre-registered table views; ``None``
    #: for genuinely non-SQL-expressible ops (driver falls back to a
    #: rows-only check).
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    #: Include in bench.py's headline set.
    bench: bool = False


QUERIES: dict[str, Query] = {}

#: Names the driver's per-round CORRECTNESS check must reach (it stops
#: after ~50 entries, in ``queries()`` order). Never-driver-verified
#: entries come FIRST so they finally get hash verdicts.
#:
#: ROTATION POLICY (the two invariants every rotation obeys):
#: 1. an entry is only excludable once it is hash-green in TWO driver
#:    rounds and its operator family keeps a surfaced anchor;
#:    never-driver-verified entries rotate IN first;
#: 2. entries whose machinery changed in the current round keep their
#:    slot so the fresh driver verdict lands on the new plan.
#: Everything registered — surfaced or not — is oracle-checked locally
#: every session by tests/test_oracle_parity.py and
#: tools/stability_check.py. Closed per-round rotation narrative
#: (rounds 5–13): docs/ROTATION.md.
#:
#: ROUND-14 ROTATION (executed 2026-08-16, per the plan recorded in
#: round 13 — the round-13 narrative moved to docs/ROTATION.md):
#: OUT (8): the eight anchors the round-13 rotation re-surfaced for
#: verdict refreshes, all freshly green in CORRECTNESS_r13 on machinery
#: unchanged this round (pipeline_corpus_curation, dedup_minhash_lsh,
#: vector_knn_batch, text_tokenize_topk, tpch_q1_pricing_summary,
#: vector_lsh_exact_parity, text_phrase_search,
#: pipeline_catalog_roundtrip) — families anchored per-entry in
#: DRIVER_EXCLUDED.
#: IN (8), at the front: the five recorded wave-2 dormant anchors, all
#: pre-verified hash-exact at sf1.0 on the round-13 tree (SCALING.md
#: round 13) — pipeline_ingest_csv (S1–S4), dedup_decontaminate,
#: events_conversion_funnel, vector_knn_exact_l2,
#: window_top_orders_salted — plus the three next-longest-dormant
#: round-3 exclusions (greens r01+r02 only): dedup_simhash,
#: hybrid_rrf_search, events_asof_click_purchase.
#: KEPT against the recorded plan, rotation invariant 2: round 14
#: CHANGED dedupidx.py (the shared batch-side materialization shape +
#: fresh-path plan collapse, VERDICT r13 task 2), so all three verified
#: filter rows AND stream_crawl_production_ingest (which composes the
#: verified filter) keep their slots — their r14 verdicts land on the
#: new plan. dedup_incremental_verified_fresh_filter is additionally
#: only one-green (r13).
#:
#: ROUND-15 ROTATION PLAN: the verified trio + production crawl become
#: excludable IF round 15 leaves dedupidx.py alone (fresh_filter will
#: be two-green after r14); the eight round-14 backfills are verdict
#: refreshes and excludable once green. Backfill from the remaining
#: round-3/4 dormant block next in line: vector_cosine_topk,
#: text_sentence_split, events_latest_snapshot, dedup_ngram_jaccard,
#: vector_group_standardize, events_sessionization — keeping every
#: family anchored (dedup via the trio or line_kept_fraction, catalog
#: via pipeline_single_insert_validation + the crawl sink rows).
#:
#: ROUND-5 THROUGH ROUND-13 ROTATIONS: moved verbatim to
#: docs/ROTATION.md (VERDICT r12 task 5).
DRIVER_CRITICAL: tuple[str, ...] = (
    # --- round-14 rotation: the five recorded wave-2 dormant anchors
    # (last driver greens r01–r03), pre-verified at sf1.0 on the r13
    # tree ---
    "pipeline_ingest_csv",            # the S1–S4 block's only driver anchor
    "dedup_decontaminate",
    "events_conversion_funnel",
    "vector_knn_exact_l2",            # the entry() flagship's own oracle row
    "window_top_orders_salted",
    # --- round-14 rotation: next-longest-dormant (excluded since
    # round 3, greens r01+r02 only) ---
    "dedup_simhash",
    "hybrid_rrf_search",
    "events_asof_click_purchase",
    # --- registered round-13 PRE-freeze: the verified filter on the
    # fresh-batch shape whose corpus side the short-circuit skips;
    # one-green (r13) and its machinery moved AGAIN this round (the
    # round-14 shared materialization + fresh-path plan collapse), so
    # it stays under both the two-green rule and invariant 2 ---
    "dedup_incremental_verified_fresh_filter",
    # --- round-12 pre-freeze registration: the full production crawl
    # composition (verified + decon + inverted + IVF in one run); kept
    # under invariant 2 — it composes the verified filter, whose
    # batch-side materialization changed this round ---
    "stream_crawl_production_ingest",
    # --- the VERIFIED dedup filter pair: kept under rotation
    # invariant 2 — round 14 changed exactly their machinery (shared
    # sig+band checkpoint, fresh-path probes), so their r14 verdicts
    # land on the new plan ---
    "dedup_incremental_verified_batch_filter",
    "dedup_incremental_verified_filter",
    # --- round-7 rotation: first green in r7 (registered mid-round-6
    # after the r6 surface froze); vector_lsh_compact_parity rotated
    # out in round 13 (five greens, slot for the pre-freeze
    # registration above) ---
    "text_positional_compact_parity",
    "text_winnow_fingerprint_overlap",
    # --- round-6 rotation: zero driver rows until now (nine registered
    # mid-round-5 after the r5 surface froze; two registered round-6
    # pre-freeze). The index-lifecycle story lands here: delete→compact,
    # manifest publish/rollback, streaming ingest→search, per-bucket
    # LSH delete, hot-cell split, hypertable retention, plus the
    # S6/S7/F6 reference operators and the BPE hash anchor. ---
    "dedup_line_kept_fraction",
    "vector_ivf_delete_compact_parity",
    "text_chapter_parse_roundtrip",
    "vector_lsh_delete_parity",
    "stream_ivf_ingest_search_parity",
    "pipeline_single_insert_validation",
    "vector_manifest_rollback_parity",
    "vector_lsh_batch_topk",
    "events_hypertable_retention",
    "text_bpe_word_freqs",            # SQL-expressible tiers of BPE: word
                                      # freqs + first merge, hash-checked
    "vector_ivf_hot_split_parity",    # split_hot_cells lifecycle anchor
    # --- r5-first-green block, now three-green (four more rotated out
    # in round 8, documented in DRIVER_EXCLUDED) ---
    "events_retention_cohorts",
    "agg_count_min_heavy_hitters",
    "stream_cms_documents",
    # --- r4-first-green block (two rotated out in round 10, documented
    # in DRIVER_EXCLUDED) ---
    "vector_bucketed_pairs_exact",
    "text_inverted_compaction_parity",
    "join_bucketed_colocated",
    "vector_late_interaction_layout_topk",
    # --- r01-backlog anchors kept after the r6 rotation (three-green;
    # retained so every family keeps a surfaced anchor; one rotated out
    # in round 10) ---
    "agg_rollup_order_status",        # grouping-sets anchor (cube twin out)
    "events_range_join_clicks_before_purchase",
    "join_semi_anti_customers",
    "setop_part_brands",              # sole set-op member
    "tpch_q3_shipping_priority",
    "window_top_orders_per_customer",
    # --- r03-block anchors kept after the r6 rotation (three-green) ---
    "hybrid_weighted_search",
    "multimodal_audio_waveform_stats",
    "stream_events_enrich_dim",
    "stream_events_rollup_upsert",
    "text_bm25_batch_topk",
    "text_bm25_search",
    "text_repetition_filter",
    "vector_bq_hamming_topk",
    "vector_filtered_knn",
    "vector_ivf_filtered_parity",
    "vector_ivf_pq_topk",
    # family anchor retained despite 2+ green rounds: the flagship
    # pipeline (P3/P5/F3/F5/J3/U1/U2/W3)
    "pipeline_multi_strategy",
)

#: Registry entries kept OUT of the driver-facing ``queries()`` surface so
#: the total stays within the driver's ~50-entry window. Rotation policy:
#: an entry is only excludable once it is hash-green in TWO driver rounds
#: (r01 AND r02 for the round-3 rotation) and its operator family keeps an
#: anchor in the surface; never-verified entries rotate IN (front of
#: DRIVER_CRITICAL) until every registered query has at least one green
#: driver row. All entries remain registered and oracle-checked locally by
#: tests/test_oracle_parity.py regardless of surface membership.
DRIVER_EXCLUDED: frozenset[str] = frozenset(
    {
        # --- excluded since round 3 (hash-green r01 AND r02; family
        # anchors documented in the round-3 registry history) ---
        "vector_cosine_topk",        # cosine anchored by lsh_exact_parity
        "text_sentence_split",       # F3 replayed in pipeline_multi_strategy
        "events_latest_snapshot",    # CDC max_by plan-pinned in test_plans
        "dedup_ngram_jaccard",       # O(n²) baseline; containment twin now in
        "vector_group_standardize",  # applyInPandas extra; knn family anchors
        "events_sessionization",     # batch twin of stream_events_sessionization
        "dedup_embedding_cosine",    # bucketed_pairs_exact is the surfaced twin
        "pipeline_balanced_lang_sample",
        "dedup_exact_groups",        # replayed inside pipeline_corpus_curation
        "text_tfidf_top_terms",
        "vector_knn_threshold",      # P2 pinned by knn_exact plan test
        "text_clean_preprocess",     # F1/P4 pinned by stream_ingest oracle
        # --- rotated OUT in round 4: hash-green in r02 AND r03 (the
        # stream/multimodal/quantization/vector families keep anchors in
        # the surface via their r03-first-green siblings) ---
        "multimodal_byte_histogram",
        "multimodal_frame_sample",
        "multimodal_image_decode_roundtrip",
        "multimodal_metadata_stats",   # audio_waveform_stats anchors family
        "pipeline_sequence_packing",
        "stream_events_dedup",
        "stream_events_interval_join",
        "stream_events_sessionization",
        "stream_events_sliding_window",
        "stream_events_tumbling_window",
        "stream_ingest_documents",
        "stream_user_topk_state",      # enrich_dim + rollup_upsert anchor
        "text_pii_scrub",
        "vector_grouping_search",
        "vector_range_search",
        "vector_sq8_rerank_topk",      # bq/ivf_pq/truncated anchor quantization
        "vector_pq_adc_topk",
        "vector_ivf_batch_topk",
        "vector_ivf_exact_parity",     # ivf_filtered_parity states the same
                                       # nprobe=nlist identity, and stays
        # rows-only entries replaced by their new exact-parity twins
        # (vector_lsh_exact_parity / vector_bucketed_pairs_exact), which
        # hash-check the same machinery instead of counting rows
        "vector_ivf_probe_topk",
        "vector_ann_lsh_topk",
        "vector_ivf_bucketed_pairs",
        # 2-green (r02+r03); dedup family anchored this round by
        # dedup_semantic_prune + dedup_ngram_containment (its CC operator
        # keeps the operator-level tests in tests/test_operators.py)
        "dedup_duplicate_clusters",
        # 1-green (r01): O(n²) baseline whose strictly-stronger twin
        # vector_bucketed_pairs_exact (all-pairs over the FULL corpus via
        # nlist=1, same oracle pattern) is surfaced — yields its slot to
        # the zero-row join_bucketed_colocated per the zero-row-first rule
        "vector_range_self_join",
        # 1-green (r01): its bigram explode/count machinery is strictly
        # subsumed by the surfaced text_bigram_lm_quality (which trains
        # the LM from those same counts) — zero-row-first rule again
        "text_bigram_top_counts",
        # --- rotated OUT in round 5: hash-green in TWO rounds (r01 +
        # r04), each family keeping a surfaced anchor ---
        "agg_cube_orders",          # agg_rollup_order_status anchors
                                    # grouping sets
        "agg_distinct_counts",      # distinct-count family anchored by the
                                    # surfaced agg_count_min_heavy_hitters
        "events_json_props",        # events anchored by exact_quantiles /
                                    # retention_cohorts / sliding / tumbling
        "events_type_stats",
        "events_user_daily_pivot",
        "pipeline_ingest_jsonl",    # pipeline anchored by multi_strategy +
                                    # train_test_split
        "text_chunk_token_windows", # text family heavily anchored (bm25,
                                    # phrase, merge-parity, stats_full)
        "window_running_revenue",   # window_top_orders_per_customer anchors
        # --- rotated OUT in round 5: permanent rows-only approximate
        # sketches (engine-specific internals, no DuckDB oracle by
        # design). Their exact-checkable twins are surfaced for hash
        # verdicts — events_exact_quantiles (type-7 quantiles vs the KLL
        # approximation), agg_count_min_heavy_hitters + stream_cms_documents
        # (hash-exact CMS construction vs the HLL++ distinct sketch's
        # family) — the same anchoring pattern that retired the IVF/LSH
        # rows-only rows in round 4. Both remain registered and
        # rows-checked locally by tests/test_oracle_parity.py.
        "agg_approx_distinct_sketch",
        "events_approx_quantiles",
        # --- rotated OUT in round 12: two greens (r10 + r11), yielding
        # its slot to the round-12 pre-freeze production-composition
        # registration. Remains registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "stream_crawl_decontaminated_ingest",  # its decontamination gate
                                             # is replayed in a strictly
                                             # stronger composition by
                                             # the surfaced
                                             # stream_crawl_production_ingest
                                             # AND by the surfaced
                                             # stream_crawl_verified_decontaminated_ingest;
                                             # the crawl family keeps six
                                             # surfaced anchors
        # --- rotated OUT in round 11: the two r8-front IVF lifecycle
        # parities, two greens each (r9 + r10), yielding their slots to
        # the round-11 pre-freeze registrations. Each remains registered
        # and oracle-checked locally by tests/test_oracle_parity.py. ---
        "vector_ivf_uri_layout_parity",      # two greens (r9+r10); fsio
                                             # storage portability is
                                             # suite-checked
                                             # (tests/test_fsio.py) and
                                             # the IVF lifecycle keeps
                                             # FOUR surfaced anchors
                                             # (delete/compact, hot-split,
                                             # declared-empty-ingest via
                                             # stream_ivf_ingest_search_parity,
                                             # filtered parity)
        "vector_ivf_declared_empty_ingest_parity",  # two greens (r9+r10);
                                             # the declare-then-ingest
                                             # path is replayed by the
                                             # surfaced
                                             # stream_ivf_ingest_search_parity
                                             # (same empty-build +
                                             # streamed-append machinery)
                                             # and pinned in tests/test_ivf.py
        # --- rotated OUT in round 10: entries with four-plus greens
        # each, yielding their slots to the three mid-round-9 zero-row
        # registrations per the zero-row-first rule. Each remains
        # registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "text_bigram_lm_quality",    # four-plus greens; its slot goes to
                                     # the PRE-freeze round-10
                                     # registration
                                     # stream_crawl_bm25_ingest_parity;
                                     # the bigram explode/count machinery
                                     # is suite-checked and the text
                                     # family keeps eight surfaced
                                     # anchors incl. the new streamed
                                     # BM25 line
        "pipeline_train_test_split", # four-plus greens; its slot goes to
                                     # the PRE-freeze round-10
                                     # registration
                                     # stream_crawl_verified_ingest; the
                                     # pipeline family keeps
                                     # pipeline_multi_strategy (flagship)
                                     # and pipeline_layout_stats, and the
                                     # deterministic-split kernel is
                                     # suite-checked by
                                     # tests/test_oracle_parity.py
        "events_sliding_window",     # four-plus greens; events keeps
                                     # four surfaced anchors
                                     # (retention_cohorts, range_join,
                                     # hypertable_retention, plus the
                                     # streaming twins); the sliding-
                                     # window kernel is replayed by the
                                     # excluded-but-suite-checked
                                     # stream_events_sliding_window
        # --- rotated OUT in round 9: r4-first-green entries with
        # four-plus greens each (r4–r8), yielding their slots to the two
        # mid-round-8 zero-row registrations per the zero-row-first
        # rule. Each remains registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "dedup_semantic_prune",      # four-plus greens; SemDeDup's
                                     # star-capped prune machinery shares
                                     # its CC core with the surfaced
                                     # dedup_line_kept_fraction family;
                                     # dedup now has six surfaced anchors
                                     # incl. both incremental filters and
                                     # the delete/compact rotation
        "dedup_ngram_containment",   # four-plus greens; n-gram shingle +
                                     # join machinery replayed by the
                                     # incremental filters' band/signature
                                     # path and the surfaced
                                     # dedup_line_kept_fraction
        # --- rotated OUT in round 8: r5-first-green entries with three
        # greens each (r5+r6+r7), yielding their slots to the four
        # mid-round-7 zero-row registrations per the zero-row-first
        # rule. Each remains registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "events_exact_quantiles",    # three greens; events anchored by
                                     # events_retention_cohorts +
                                     # events_sliding_window +
                                     # events_range_join_clicks_before_purchase
                                     # + events_hypertable_retention
        "multimodal_image_feature_knn",  # three greens; multimodal
                                     # anchored by the surfaced
                                     # multimodal_audio_waveform_stats
                                     # (same binary-payload + mapInPandas
                                     # machinery); the knn side is
                                     # anchored by the whole vector block
        "dedup_dup_span_fraction",   # three greens; line/span dedup
                                     # anchored by dedup_line_kept_fraction
                                     # (same C4 line-dedup kernel), plus
                                     # dedup_semantic_prune,
                                     # dedup_ngram_containment and both
                                     # incremental filters rotating in
        "text_nb_lang_confusion",    # three greens; text-analysis family
                                     # heavily anchored (bm25 search+batch,
                                     # phrase, repetition, bigram LM,
                                     # chapter parse, positional compact,
                                     # winnowing fingerprints)
        # --- rotated OUT in round 7: per the round-7 rotation note
        # above. Each remains registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "text_bpe_vocab_merges",     # permanent rows-only (iterated greedy
                                     # merges are not closed-form SQL; loop
                                     # pinned to the Sennrich worked example
                                     # in tests/test_operators.py). Its
                                     # exact-checkable twin
                                     # text_bpe_word_freqs (word freqs +
                                     # first merge) is surfaced hash-green —
                                     # the surface is now 100% hash-checked.
        "text_inverted_merge_parity",  # two greens (r5+r6); inverted
                                     # lifecycle anchored by the surfaced
                                     # text_inverted_compaction_parity and
                                     # the positional compactor rotating in
        "dedup_line_first_occurrence",  # two greens (r5+r6); line-dedup
                                     # anchored by dedup_line_kept_fraction
                                     # (same operator, per-doc survival
                                     # report) + dedup_dup_span_fraction
        # --- rotated OUT in round 6: hash-green in THREE rounds each
        # (r01+r04+r05 for the first four, r03+r04+r05 for the rest),
        # yielding their slots to the eleven zero-row lifecycle/BPE
        # entries per the zero-row-first rule. Family anchors kept in
        # the surface, documented per entry. ---
        "events_tumbling_window",     # events anchored by sliding window,
                                      # range join, exact_quantiles,
                                      # retention_cohorts + hypertable
                                      # retention rotating in
        "text_stats_full",            # text anchored by bm25_search/batch,
                                      # phrase, repetition, nb_lang, bigram
        "tpch_q5_local_supplier_volume",  # tpch_q3 anchors relational
        "vector_centroid_norm",       # vector family heavily anchored
                                      # (ivf/lsh/bq/pq + lifecycle block)
        "events_hypertable_rollup",   # hypertable anchored by the stronger
                                      # events_hypertable_retention (same
                                      # rollup + drop_chunks on top)
        "text_bm25_inverted_topk",    # bm25 anchored by text_bm25_search
                                      # + batch + inverted merge/compaction
                                      # parities (same postings machinery)
        "text_sparse_weighted_topk",  # sparse/hybrid scoring anchored by
                                      # hybrid_weighted_search
        "vector_partition_key_search",  # per-tenant pruning stated by the
                                        # ivf_filtered_parity plan tests
        "vector_search_pagination",   # offset window over the same knn path
        "vector_truncated_rerank",    # quantization anchored by bq/ivf_pq
        "vector_late_interaction_topk",  # layout twin (stronger: stored
                                         # chunk embeddings) stays surfaced
        # --- rotated OUT in round 14: the eight round-13 verdict
        # refreshes, all hash-green in CORRECTNESS_r13 on machinery
        # unchanged in round 14. Each remains registered and
        # oracle-checked locally by tests/test_oracle_parity.py. ---
        "pipeline_corpus_curation",   # bench headline (stays benched);
                                      # pipeline anchored by
                                      # pipeline_multi_strategy +
                                      # pipeline_ingest_csv rotating in
        "dedup_minhash_lsh",          # dedup keeps seven surfaced anchors
                                      # (verified trio, line_kept_fraction,
                                      # winnow, + decontaminate/simhash in)
        "vector_knn_batch",           # batch kernel plan-pinned
                                      # (tests/test_plans.py:540) and
                                      # replayed by vector_lsh_batch_topk /
                                      # text_bm25_batch_topk; exact-l2 twin
                                      # rotates in
        "text_tokenize_topk",         # F2 replayed by every BM25 oracle
        "tpch_q1_pricing_summary",    # bench headline (stays benched);
                                      # relational anchored by tpch_q3
        "vector_lsh_exact_parity",    # LSH keeps delete parity + batch topk
        "text_phrase_search",         # positional index anchored by
                                      # text_positional_compact_parity
        "pipeline_catalog_roundtrip", # S8/S9 freshly r13-green; catalog
                                      # machinery keeps TWO surfaced
                                      # anchors (S6 via
                                      # pipeline_single_insert_validation,
                                      # S5 via the production crawl's
                                      # batched-insert sink)
        # --- registered round 14, bench-only by design: the bounded
        # (doc_id < 1000 slice) bench twin of the production intake
        # composition. The FULL stream_crawl_production_ingest row is
        # the surfaced driver anchor for this machinery; the twin
        # exists so the composed gates+sinks DAG has a BENCH_r{N} line
        # (VERDICT r13 task 3) and is oracle-checked locally like
        # every exclusion. ---
        "stream_crawl_production_bench",
        # --- rotated OUT in round 13: two-plus greens each on machinery
        # untouched this round, yielding their slots to the eight
        # re-surfaced longest-dormant anchors (docs/ROTATION.md). Each
        # remains registered and oracle-checked locally by
        # tests/test_oracle_parity.py. ---
        "stream_crawl_dedup_gated_ingest",   # three greens (r10–r12); its
                                             # dedup gate is replayed
                                             # strictly stronger by the
                                             # surfaced production row
        "pipeline_layout_stats",             # three greens; table-level
                                             # describe/stats re-anchored by
                                             # the re-surfaced
                                             # pipeline_catalog_roundtrip;
                                             # layout stats suite-pinned in
                                             # tests/test_layout_stats.py
        "stream_crawl_verified_ingest",      # three greens; verified-mode
                                             # admission replayed by the
                                             # surfaced production row
        "stream_crawl_bm25_ingest_parity",   # three greens; the streamed
                                             # inverted sink + BM25 leg is
                                             # replayed by the production
                                             # row's bm25 stage
        "stream_crawl_verified_decontaminated_ingest",  # two greens
                                             # (r11+r12); both-gates
                                             # composition subsumed by the
                                             # production row (same gates,
                                             # more sinks)
        "dedup_incremental_delete_compact",  # four greens (r9–r12); the
                                             # tombstone/compact lifecycle
                                             # is suite-pinned
                                             # (tests/test_dedupidx.py) and
                                             # the layout keeps both
                                             # verified filter rows surfaced
        "dedup_incremental_batch_filter",    # four greens; band-mode cost
                                             # line — band machinery
                                             # unchanged this round; its
                                             # verified twin stays surfaced
        "dedup_incremental_index_filter",    # three greens (r10–r12);
                                             # band-mode two-stage lifecycle
                                             # anchored by the surfaced
                                             # verified pair (superset
                                             # machinery) + suite pins
        "vector_lsh_compact_parity",         # five greens (r7–r12) on a
                                             # compactor unchanged since
                                             # round 6; yields its slot to
                                             # the round-13 pre-freeze
                                             # registration; LSH keeps
                                             # THREE surfaced anchors
                                             # (delete parity, batch topk,
                                             # re-surfaced exact parity)
    }
)


def driver_queries() -> dict[str, Query]:
    """The ordered, capped query surface exposed to the driver.

    Round 1's CORRECTNESS run recorded verdicts for exactly the first 50 of
    64 registered queries, leaving the flagship pipeline, the IVF/LSH index
    family, streaming, and multimodal unverified. This surface puts those
    first and trims redundant green fillers so every entry fits the window.
    """
    ordered: dict[str, Query] = {}
    for name in DRIVER_CRITICAL:
        ordered[name] = QUERIES[name]
    for name, q in QUERIES.items():
        if name not in ordered and name not in DRIVER_EXCLUDED:
            ordered[name] = q
    return ordered


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco
