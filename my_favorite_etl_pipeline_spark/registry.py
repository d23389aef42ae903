"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers one named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, the
equivalent ANSI SQL that DuckDB runs on the same parquet tables. The driver
compares both sides (row count + schema + order-insensitive value hash), so:

- alias every computed column identically on both sides;
- round floating aggregates to a fixed number of decimals on BOTH sides
  (summation order differs between engines; see ``fdec`` helpers in plans);
- cast count-like integer aggregates to BIGINT on the DuckDB side (DuckDB
  widens SUM(int) to HUGEINT, Spark keeps BIGINT);
- NEVER round a float DIVISION whose true quotient can hit exact decimal
  halves (sum/count with 4-decimal sums and small counts → x.xx125):
  Spark rounds the shortest decimal representation (BigDecimal HALF_UP),
  DuckDB rounds the raw binary double, and they disagree exactly at those
  halves. Use fixed-point integer math instead — scale to an exact BIGINT
  and integer-divide on both engines (see continuous_aggregate_rollup,
  found by an sf0.1 sweep after passing at sf0.01 for three rounds).

Runtime contract notes:

- CACHE OWNERSHIP: some queries persist multi-consumer intermediate frames
  (tfidf's tf/unit projections, dedup's shingle table) via
  ``caching.tracked_persist``. The persists are intentional materialization
  points with an engine-level lifecycle: wrap *build plan → run action* in
  ``with caching.materialized_scope():`` and every persist created inside
  is released on exit (tools/check.py and the pipeline runner do; see
  tests/test_cache_lifecycle.py). Outside a scope the caller owns cleanup,
  preserving cross-run cache reuse for bench-style repeated execution.
- LAZINESS: building a plan is normally free, but adaptive plans may run a
  tiny scalar probe job during CONSTRUCTION (tfidf_topk_similar_docs runs a
  max(df) aggregate to decide whether phase-1 salting is worth a shuffle).
  Plan-shape-only consumers should expect a query function to possibly
  launch a small job and populate a cache.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with an optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver's CORRECTNESS harness checks the first 50 entries of ``queries()``
# in iteration order. With ~100 registered queries, raw module-import order let
# the whole LLM-data [EXT] surface fall past the cap in round 1. This curated
# prefix guarantees the checked window spans every operator family: the
# reference-parity pipeline, the core relational shapes, dedup (exact + MinHash
# + SimHash + embedding), similarity search, text analysis, multimodal,
# dataset-assembly, SCD2, and streaming. Names not yet registered are skipped,
# so the list may lead the code; everything else follows in registration order.
CURATED_FIRST: tuple[str, ...] = (
    # R10 ROTATION (VERDICT r9 item 6): drift re-detection continues — the
    # nine r9 day-ones that went driver-green rotate OUT (still verified by
    # the full local harness + the end-of-round sf0.1 sweep + determinism),
    # their slots RETURN the five flagships they displaced
    # (q5/q18/pivot/asof/dedup_cluster_components), and the nine r10
    # operators driver-check from day one: both auto-k scale-safe twins,
    # the durable graph search, graph PageRank, the trained quality
    # classifier pair, the unigram-LM trainer/encoder pair, and the
    # watermarked append-mode PSI monitor (grouping_sets/cube re-greened
    # in r9 and yield their slots; quality_classifier_linear yields to
    # its own trained successors). BOTH r9 hash-red rows
    # (knn_graph_nn_descent, graph_ann_search_topk) stay IN per VERDICT r9
    # item 1 — the integer-cosine + lock/atomic-rename fix needs a driver
    # re-check to clear them. lang_id_heuristic and embedding_topk_
    # pandas_udf complete the slot budget (X4 keeps 4 other members
    # in-window, X3 keeps 7; the UDF surface stays pinned by equivalence
    # tests). Late-r10 additions (exact percentiles, 3-sigma gate,
    # correlation audit, interpolation gapfill, audio envelope dedup,
    # Count-Min) each entered day-one, displacing the longest-green
    # non-critical returnee named at each insertion; final census:
    # 18 r10 day-ones, 32 returning of 50.
    #
    # reference-parity pipeline anchors (SURVEY §2.1-§2.8): pinned always
    "incremental_extract",
    "merge_upsert",
    "dq_gate",
    "reconciliation",
    # relational: flagships + the full returning tail (q5/q18/pivot/asof
    # return after yielding their r9 slots)
    "q3_shipping_priority",
    "q1_pricing_summary",
    "q5_region_revenue",
    "q18_large_orders",
    "pivot_status_by_segment",
    "asof_last_click_before_purchase",
    # transform/flatten chains (F3/P/J families)
    "transform_chain",
    "typed_struct_props_chain",
    "variant_props_chain",
    # timeseries + sketches (continuous_aggregate_rollup carries the
    # cross-engine rounding scar tissue — exactly where drift bites first)
    "continuous_aggregate_rollup",
    # timeseries band (r10): the interpolation gapfill twin enters day-one
    # (range_join_ship_latency yields — long-green, and the asof sentinel
    # keeps the non-equi-join family in-window)
    "gapfill_interpolate_hourly",
    "theta_sketch_user_overlap",
    # sketch band (r10): Count-Min point-frequency estimates join the KMV
    # entry (winnowing_fingerprints yields: green since r2, X4 keeps 5
    # members in-window)
    "countmin_frequency_estimates",
    # stats band (r10): exact two-phase quantiles — the no-global-sort
    # exact twin of the approx percentile sketch (q8_market_share yields
    # its slot; the relational family keeps 6 other members in-window) —
    # and the exact-integer 3-sigma anomaly gate (scd2_status_history
    # yields: green since r1, its family keeps 6 members in-window)
    "exact_percentiles_two_phase",
    "anomalous_hours_3sigma",
    # stats band (r10): the Pearson correlation audit joins the 3-sigma
    # gate (simhash_near_dups_portable yields: green since r5, X2 keeps
    # 4 members in-window)
    "event_type_correlation_matrix",
    # model filters: the r10 TRAINED pair replaces the linear sentinel
    # (same feature space; the hash-weight stand-in rotates out green)
    "quality_classifier_train_gd",
    "quality_classifier_gd_scores",
    # X1 exact dedup + span arms
    "dedup_exact_groups",
    "dedup_fingerprint_groups",
    "exact_span_dedup_20tok",
    # X2 near-dup: flagships + BOTH semdedup postures (fixed-k baseline
    # and the r10 auto-k scale-safe twin) + the returning full-lineage CC
    "minhash_near_dups",
    "semdedup_cluster_pairs",
    "semdedup_cluster_pairs_auto_k",
    "dedup_cluster_components",
    # X3 similarity: anchors + sparse retrieval + the graph family —
    # auto-k base build (r10), both r9 REDS held in for re-check, and the
    # durable serving posture (r10)
    "embedding_topk_bruteforce",
    "tfidf_topk_similar_docs",
    "bm25_topk_docs",
    "knn_graph_topk_auto_k",
    "knn_graph_pagerank",
    "knn_graph_nn_descent",
    "graph_ann_search_topk",
    "graph_ann_search_durable",
    # X4 text + the r10 unigram-LM (SentencePiece-style) tokenizer pair
    "gopher_quality_flags",
    "contamination_13gram",
    "unigram_lm_train_model",
    "unigram_lm_encode_fertility",
    "topic_cluster_cards",
    # X5 multimodal: the resize sentinel + the r10 perceptual-hash dedup
    # pair — image dHash and its audio envelope twin
    # (embedding_topk_ivf_kmeans yields: X3 keeps 8 members in-window)
    "multimodal_resize_8x8",
    "image_dhash_near_dups",
    "audio_envelope_near_dups",
    # S1b docstore (sole family member, pinned)
    "docstore_lang_source_stats",
    # dataset assembly
    "training_data_prep",
    # X6 streaming: both anchors + the r10 watermarked append-mode PSI
    "stream_tumbling_hourly",
    "stream_stream_attribution_join",
    "stream_psi_windowed_append",
)


def _ordered_names() -> list[str]:
    head = [n for n in CURATED_FIRST if n in REGISTRY]
    seen = set(head)
    return head + [n for n in REGISTRY if n not in seen]


def queries() -> dict[str, QueryFn]:
    return {n: REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: REGISTRY[n].oracle for n in _ordered_names() if REGISTRY[n].oracle is not None
    }
