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
    # R11 ROTATION (VERDICT r10 items 1, 4, 5): this round's window is the
    # DIVERGENCE-FORENSICS round. The 4 two-round driver-red rows stay IN,
    # now re-scored under the pure-integer quantized-cosine contract
    # (knn_graph_nn_descent, graph_ann_search_topk, graph_ann_search_durable)
    # and the all-integer classifier (quality_classifier_train_gd, with its
    # green scores twin kept for the train-vs-scores contrast). Joining
    # them: 11 forensic entries — 6 trajectory stages (classifier feature
    # checksum + epoch-1/epoch-8 weight prefixes; graph cell assignment +
    # seed scores + round-1 working list) and 5 engine-behavior probes
    # (input-data fingerprint, tokenize+md5, ROUND half-cases, float
    # summation ORDER, and the RETIRED float-cosine contract replayed) —
    # so CORRECTNESS_r11 localizes WHERE the driver diverges instead of
    # reporting one opaque red per pipeline (plans/forensics.py). The
    # whole graph family re-enters day-one because its VALUES changed this
    # round (integer quantization + rounds 2→3): knn_graph_topk returns,
    # auto-k + pagerank stay. The 18 green r10 day-ones rotate OUT (still
    # verified by the full local harness + sf0.1 sweep + determinism +
    # isolation matrix); the VERDICT-named displaced band RETURNS: q8,
    # range_join, scd2, winnowing, simhash_portable, ivf_kmeans,
    # grouping_sets, quality_classifier_linear, lang_id_heuristic, and the
    # hll/pandas_udf sentinels. Long-green q5/q18/pivot/asof/variant/
    # typed_struct/cube/q9 yield their slots this round (every family
    # keeps ≥1 member in-window; 21 returning entries of 50).
    #
    # reference-parity pipeline anchors (SURVEY §2.1-§2.8): pinned always
    "incremental_extract",
    "merge_upsert",
    "dq_gate",
    "reconciliation",
    # relational: flagships + the VERDICT-named returning band
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
    # X1 exact dedup + X2 near-dup returning band; the r11 canonical-
    # selection composition enters day-one (hll_sketch_merge yields its
    # returning slot: rows-only = the weakest driver check, and its
    # oracle-checked twins theta/countmin stay sweep-verified)
    "dedup_exact_groups",
    "simhash_near_dups_portable",
    "minhash_near_dups",
    "semdedup_cluster_pairs",
    "dedup_canonical_pagerank",
    # X3 similarity: anchors + the returning ivf_kmeans sentinel; r11's
    # semantic decontamination (first new op on the integer contract)
    # enters day-one (embedding_topk_pandas_udf yields — the UDF surface
    # stays pinned by the pandas/JVM equivalence tests, the r10 precedent)
    "embedding_topk_bruteforce",
    "tfidf_topk_similar_docs",
    "semantic_decontaminate_topk",
    # r11 token-budget selection enters day-one (winnowing_fingerprints
    # yields — green since r2; X1 keeps dedup_exact_groups in-window)
    "token_budget_select",
    # X3 graph family — ALL values changed r11 (integer contract +
    # rounds 3): full family re-check + the 3 trajectory forensics
    "knn_graph_topk",
    "knn_graph_topk_auto_k",
    "knn_graph_pagerank",
    "knn_graph_nn_descent",
    "graph_ann_search_topk",
    "graph_ann_search_durable",
    # the r11 two-layer router enters day-one (embedding_topk_ivf_kmeans
    # yields — the r10 precedent: the IVF family keeps ivf_pq/pq_adc
    # local-O + sweep-verified, and hnsw extends the same X3 family the
    # window is concentrating on this round)
    "hnsw_two_layer_search",
    "knn_assign_cells",
    "knn_seed_edges",
    "knn_nn_descent_round1",
    # X4 text anchors + returning band + the classifier pair under
    # forensic instrumentation (3 trajectory stages)
    "gopher_quality_flags",
    "contamination_13gram",
    "lang_id_heuristic",
    "quality_classifier_linear",
    "quality_classifier_train_gd",
    "quality_classifier_gd_scores",
    "qc_features_checksum",
    "qc_train_epoch1_weights",
    "qc_train_epoch8_weights",
    # engine-behavior probes (plans/forensics.py §2)
    "oracle_probe_data_fingerprint",
    "oracle_probe_tokenize_md5",
    "oracle_probe_round_half",
    "oracle_probe_float_sum_order",
    "oracle_probe_float_cosine_x1e4",
    # X5 multimodal sentinel
    "multimodal_resize_8x8",
    # S1b docstore (sole family member, pinned)
    "docstore_lang_source_stats",
    # dataset assembly
    "training_data_prep",
    # X6 streaming anchors
    "stream_tumbling_hourly",
    "stream_stream_attribution_join",
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
