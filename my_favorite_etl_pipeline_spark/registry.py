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
    # reference-parity pipeline (SURVEY §2.1-§2.8; sorted_extract rotated
    # out r6 after five green rounds — O1 stays pytest-covered)
    "incremental_extract",
    "transform_chain",
    "nested_transform_chain",
    "merge_upsert",
    "dq_gate",
    "reconciliation",
    # struct-extraction twins (typed-struct / Variant, new r5) — never
    # driver-checked before r6
    "typed_struct_props_chain",
    "variant_props_chain",
    # core relational shapes (anti_join_customers rotated out r6 after five
    # green rounds; the join surface keeps range + as-of in-window)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "top_orders_per_customer",
    "rollup_order_status",
    "pivot_status_by_segment",
    "range_join_ship_latency",
    "asof_last_click_before_purchase",
    # events analytics (funnel/retention/gap-fill — never driver-checked
    # before r6; sessionize/z-order continue from their r5 rotation)
    "funnel_view_to_purchase",
    "retention_cohorts",
    "gapfill_locf_hourly",
    # X1 exact dedup (plain-groups rotated out mid-r5 after four green
    # rounds — fingerprint/keep-first variants stay locally checked;
    # keep-BEST exercises the richer cluster → canonical-selection
    # composition; normalized-text is the casefold/whitespace rung)
    "dedup_keep_best",
    "dedup_normalized_text",
    # X2 near-dup — every slot hash-verified; r6 adds the portable-hash
    # SimHash twins (md5-derived bits, the only SimHash arm DuckDB can
    # replay value-exactly) — never driver-checked before
    "minhash_near_dups",
    "ssjoin_prefix_filter",
    "simhash_signatures_portable",
    "simhash_near_dups_portable",
    "embedding_cosine_near_dups",
    "embedding_cosine_near_dups_lsh",
    "semdedup_cluster_pairs",
    # X3 similarity search (dense + sparse; the self-contained k-means IVF
    # scale path earned an oracle mid-r5 — Lloyd round unrolled in SQL —
    # and rotates in never-driver-checked)
    "embedding_topk_bruteforce",
    "embedding_topk_ivf_kmeans",
    "tfidf_topk_similar_docs",
    # X3 lexical retrieval — BM25, brand-new r6, driver-checked from day
    # one (the exact_span precedent)
    "bm25_topk_docs",
    # X4+ curation filters (gopher_quality_flags and repetition_filter
    # rotated out r6 after four green rounds; the family keeps the
    # decontamination join in-window)
    "contamination_13gram",
    # X4 text analysis / chunking / prep (lang-id, BPE-ish counts, PII
    # scrub, quality-median, and training_data_prep rotated out r6 after
    # 4-5 green rounds each; span dedup keeps BOTH arms in-window —
    # detection + the r6 canonical-path excision — plus the brand-new
    # cross-corpus decontamination excision, driver-checked from day one)
    "exact_span_dedup_20tok",
    "dedup_excise_spans_20tok",
    "decontaminate_excise_13gram",
    "chunk_documents_50tok",
    # X5 multimodal (image decode + audio decode; frame-sample checked
    # locally; the resize roundtrip — brand-new r6 — driver-checked from
    # day one)
    "multimodal_features",
    "multimodal_audio_features",
    "multimodal_resize_8x8",
    # dataset assembly (dataset_split_hash rotated out r6 after four green
    # rounds and quota_sample after three; the shard-shuffle assignment —
    # new r5, never driver-checked — covers the same deterministic-hash
    # family plus the no-global-sort shard layout)
    "training_shard_assignment",
    "dedup_cluster_components",
    # graph CC large/small-star variant (O(log² n) rounds for long chains)
    "dedup_cluster_components_star",
    # batch sessionization + Z-order layout (events table)
    "sessionize_events_gap30m",
    "zorder_events_morton",
    # SCD2
    "scd2_status_history",
    # X6 streaming (stream_dedup_within_watermark rotated out r6 after
    # three green rounds; the family keeps tumbling, stateful, the
    # stream-stream join, and the session window in-window)
    "stream_tumbling_hourly",
    "stream_stateful_user_stats",
    "stream_stream_attribution_join",
    "session_window_30m",
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
