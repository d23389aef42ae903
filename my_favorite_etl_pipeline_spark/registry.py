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
    # R13 ROTATION (VERDICT r12 items 1 and 4): seat the 10 late-r12
    # operators that were deliberately kept OUT of the frozen r12
    # fix-confirmation window (edit_distance / matryoshka / manifests /
    # packing trio / span-profile / cell-report / snapshot-diff /
    # epoch-repeat / stream-manifest — all sweep-verified at 3 SFs, zero
    # driver rows yet), and return the displaced band with no row since
    # r11 (q8, grouping_sets, range_join, scd2, simhash_portable,
    # semantic_decontaminate_topk, token_budget_select). OUT: the spent
    # HUGEINT experiment (oracle_probe_hugeint_passthrough/_cast,
    # knn_seed_edges, qc_train_epoch1_weights — diagnosis driver-PROVEN
    # r12, recorded CLOSED in BASELINE.md; the passthrough probe would
    # sit permanently red by design if left in) and 13 r12-green
    # veterans whose families stay represented (q5/q9/q18/pivot/cube/
    # asof/typed_struct/variant/winnowing/pandas_udf/durable/two_layer/
    # hll). hnsw_three_layer_search STAYS: its small-corpus router
    # fallback changed this round and must re-prove green.
    # Every one of the 50 entries below is oracle-checked (no rows-only
    # rows in this window; hll's invariant tests cover it out-of-window).
    #
    # reference-parity pipeline anchors (SURVEY §2.1-§2.8): pinned always
    "incremental_extract",
    "merge_upsert",
    "dq_gate",
    "reconciliation",
    # relational: flagships + the returning r11 band
    "q3_shipping_priority",
    "q1_pricing_summary",
    "q8_market_share",
    "grouping_sets_revenue",
    "range_join_ship_latency",
    "scd2_status_history",
    # transform/flatten chains (F3/P/J families)
    "transform_chain",
    # timeseries (continuous_aggregate_rollup carries the cross-engine
    # rounding scar tissue)
    "continuous_aggregate_rollup",
    # X1 exact dedup + X2 near-dup band + the character-level newcomer
    "dedup_exact_groups",
    "minhash_near_dups",
    "semdedup_cluster_pairs",
    "dedup_canonical_pagerank",
    "simhash_near_dups_portable",
    "edit_distance_near_dups",
    # X3 similarity anchors + the truncation/cell audits (new)
    "embedding_topk_bruteforce",
    "tfidf_topk_similar_docs",
    "matryoshka_prefix_recall",
    "ann_cell_size_report",
    # X3 graph family — rounds=4 flip + the three-layer router fallback
    # both land this round, so the whole serving chain re-proves
    "knn_graph_topk_auto_k",
    "knn_graph_pagerank",
    "knn_graph_nn_descent",
    "graph_ann_search_topk",
    "graph_ann_search_batch",
    "hnsw_three_layer_search",
    "hnsw_batch_routed_search",
    # X4 text anchors + contamination severity (new) + returning band
    "gopher_quality_flags",
    "contamination_13gram",
    "contamination_span_profile",
    "semantic_decontaminate_topk",
    "lang_id_heuristic",
    "quality_classifier_linear",
    "quality_classifier_train_gd",
    "quality_classifier_gd_scores",
    # mixture/sampling + dataset assembly: the late-r12 block enters
    "token_budget_select",
    "epoch_repeat_plan",
    "semantic_packing_order",
    "pack_docs_histogram",
    "pack_efficiency_report",
    "shard_manifest_checksums",
    # M4 time travel on the oracle path (new)
    "mart_snapshot_diff",
    # X5 multimodal sentinel
    "multimodal_resize_8x8",
    # S1b docstore (sole family member, pinned)
    "docstore_lang_source_stats",
    # X6 streaming anchors + the 8-row streaming-state manifest (new)
    "stream_tumbling_hourly",
    "stream_stream_attribution_join",
    "stream_merge_into_mart",
    "stream_shard_manifest",
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
