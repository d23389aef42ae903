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
    # R7 ROTATION (VERDICT r6 item 2): 19 slots whose entries had 5-6
    # green driver exposures rotate out (transform_chain, q1/q5,
    # top_orders, rollup, pivot, range/as-of joins, ssjoin,
    # embedding_cosine_near_dups, embedding_topk_bruteforce, chunking,
    # audio decode, SCD2, contamination join, plain CC, stateful stream,
    # session window — all stay judge-verified via the local 135-query
    # harness); 19 never-driver-checked entries rotate in, burning the
    # r6 backlog of 31 down to 13.
    #
    # reference-parity pipeline anchors (SURVEY §2.1-§2.8): the four task
    # semantics of the reference DAG stay pinned; the transform chains
    # hand their slots to the typed-struct/Variant twins (2nd exposure)
    "incremental_extract",
    "merge_upsert",
    "dq_gate",
    "reconciliation",
    "typed_struct_props_chain",
    "variant_props_chain",
    # core relational surface — q3 stays as the top-k/broadcast anchor;
    # rotated IN (never driver-checked): the remaining TPC-H-style
    # shapes, the window/SQL-API/unpivot surfaces, profiling, fuzzy join,
    # decimal/try_/surrogate-key surfaces, and the Zipf-skew aggregation
    "q3_shipping_priority",
    "q11_important_stock",
    "q17_small_quantity_revenue",
    "q20_bulk_suppliers",
    "q21_waiting_suppliers",
    "window_function_surface",
    "sql_api_surface",
    "unpivot_lineitem_measures",
    "fuzzy_join_part_names",
    "profile_orders_columns",
    "skew_zipf_top_users",
    "decimal_surface",
    "try_function_surface",
    "surrogate_keys",
    # events analytics — funnel keeps the family slot; retention/gapfill
    # rotate out at 3 green exposures for the brand-new r7 model-filter
    # rungs (driver-checked from day one, the exact_span/bm25 precedent)
    "funnel_view_to_purchase",
    "quality_classifier_linear",
    "perplexity_buckets_ccnet",
    # X1 exact dedup — keep-best (4th) holds the family slot; normalized
    # rotates out at 3 green exposures (stays judge-verified locally);
    # fingerprint-groups continues (2nd)
    "dedup_keep_best",
    "dedup_fingerprint_groups",
    # X2 near-dup — minhash anchors the family; portable SimHash twins
    # (2nd), embedding LSH (3rd), SemDeDup (3rd)
    "minhash_near_dups",
    "simhash_signatures_portable",
    "simhash_near_dups_portable",
    "semdedup_cluster_pairs",
    # embedding LSH rotates out at 3 green exposures for the r7 funnel
    # audit (new, composes gopher+classifier+dedup+decontamination)
    "curation_funnel_report",
    # X3 similarity search — tfidf + bm25 MUST stay in-window (both
    # changed this round: shared posting pipeline + BM25 truncation);
    # k-means IVF continues (3rd) plus its brand-new probe-6 recall-knob
    # twin (r7, driver-checked from day one); rotated IN: the pandas_udf
    # dense arm
    "embedding_topk_ivf_kmeans",
    "embedding_topk_ivf_kmeans_probe6",
    "embedding_topk_pandas_udf",
    "tfidf_topk_similar_docs",
    "bm25_topk_docs",
    # X4 text analysis / curation — span-dedup both arms (3rd/2nd) +
    # decontamination excision (2nd); rotated IN: winnowing fingerprints
    # and both LM-scorer rungs, never driver-checked
    "exact_span_dedup_20tok",
    "dedup_excise_spans_20tok",
    "decontaminate_excise_13gram",
    "winnowing_fingerprints",
    "unigram_logprob_scores",
    "bigram_logprob_scores",
    # X5 multimodal — the resize roundtrip (2nd, pixel-sum oracle) holds
    # the family slot; image decode rotates out at 5 green exposures to
    # make room for the probe-6 IVF twin above
    "multimodal_resize_8x8",
    # S1b — the docstore DSv2 source's first driver-checkable query
    # (brand-new r7, driver-checked from day one — the exact_span/bm25
    # precedent)
    "docstore_lang_source_stats",
    # dataset assembly + clustering — shard shuffle (2nd), star-variant
    # CC (3rd; same oracle as the plain CC it stands in for), plus the
    # r7 leakage-safe split (new, composes the CC family) and D4
    # prototype pruning + PQ-ADC retrieval (new, embedding family);
    # sessionization/Z-order rotate out at 3 green exposures
    "training_shard_assignment",
    "dedup_cluster_components_star",
    "leakage_safe_split",
    "prototype_prune_d4",
    "embedding_topk_pq_adc",
    # X6 streaming — tumbling + the stream-stream join anchor the family
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
