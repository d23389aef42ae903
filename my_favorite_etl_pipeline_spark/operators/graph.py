"""Connected components over an edge list — the clustering step that turns
pairwise near-duplicate hits (MinHash/SimHash/Jaccard pairs) into dedup
GROUPS: every doc in a component keeps/drops together, with the component
min-id as the canonical representative.

Spark-first design: iterative min-label propagation expressed as DataFrame
joins. Labels only ever decrease, so the fixpoint is the per-component min
id. Each iteration is one shuffle join + one aggregate;
``localCheckpoint(eager=True)`` truncates lineage so the plan does not grow
with the iteration count (the classic iterative-DataFrame trap). Converges
in O(component diameter) rounds — near-dup clusters are shallow (dozens of
docs, diameter ≤ a few hops), so 3-5 rounds in practice; for adversarial
long-chain graphs :func:`connected_components_star` implements the
large-star/small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond") with the same output contract in O(log² n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    rounds_per_check: int = 2,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough);
    ``vertices`` optionally supplies isolated nodes (they become singleton
    components). ``vertices`` MUST be unique ids (a primary-key column):
    since r6 the isolated-vertex path is a plain anti-join projection, so a
    duplicated input id would emit one singleton row per duplicate — the
    dedup that used to hide that was dropped deliberately, because a
    ``distinct()`` on the (corpus-sized) isolated subset is a full extra
    exchange at 100 TB for inputs that are already key columns everywhere
    in this repo (ADVICE r6). Raises if the fixpoint is not reached within
    ``max_iter`` propagation rounds.

    BATCHED CONVERGENCE PROBING (r16-opt, VERDICT r15 item 5): the driver
    round-trip, not the per-round join, is the fixture-scale floor — so
    ``rounds_per_check`` propagation rounds run inside ONE job and only
    the LAST round's change flag is aggregated. Equivalence is monotone:
    labels only decrease, so "round k changed nothing" implies every
    round after k is the identity — checking only the batch-final round
    detects the fixpoint exactly (a batch may run ≤ rounds_per_check − 1
    identity rounds past convergence; an identity round is bit-identical
    by definition). Shallow near-dup graphs (diameter ≤ 2 on the
    fixtures) converge in one collect instead of two+. Within a batch the
    previous round's label subtree appears on both sides of the next
    round's join; Spark's ReuseExchange dedupes the identical exchange,
    so the batch costs the same shuffles as unbatched rounds.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # materialize once — every iteration joins against it, and recomputing
    # the (possibly expensive) pair-generation upstream per round would
    # dominate the whole fixpoint
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # The fixpoint runs over EDGE-INCIDENT nodes only: an isolated vertex
    # is a singleton component by definition and needs no iteration. In a
    # near-dup graph that subgraph is a few percent of the corpus, so every
    # round's join, checkpoint, and convergence aggregate shrink by the
    # same factor; the isolated vertices join back once, after convergence
    # (anti-join + self-label union — one extra shuffle total).
    nodes = sym.select(F.col("u").alias("node")).distinct()

    # lazy checkpoint (r16-opt): the first batch's aggregate materializes
    # it — same truncation, one fewer up-front job than eager
    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(
        eager=False
    )
    done = 0
    while done < max_iter:
        k = min(max(1, rounds_per_check), max_iter - done)
        cur = labels
        for i in range(k):
            nbr_min = (
                sym.join(cur, sym.v == cur.node)
                .groupBy(F.col("u").alias("nb_node"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            # change-detection is folded into the label update: the `chg`
            # flag plus a lazy localCheckpoint means the single
            # count-aggregate action below BOTH materializes the batch's
            # checkpoint (the full aggregate computes every partition,
            # unlike limit(1)) and returns the convergence signal — one
            # job launch per BATCH, no set-difference join. Intermediate
            # rounds carry no flag (only the batch-final round's matters).
            proj = [
                F.col("node"),
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            ]
            if i == k - 1:
                proj.append(
                    (F.coalesce("nbr_comp", "comp") < F.col("comp")).alias("chg")
                )
            cur = cur.join(nbr_min, cur.node == F.col("nb_node"), "left").select(*proj)
        new_labels = cur.localCheckpoint(eager=False)
        changed = new_labels.agg(
            F.coalesce(F.sum(F.col("chg").cast("long")), F.lit(0))
        ).collect()[0][0]
        labels = new_labels.drop("chg")
        done += k
        if changed == 0:
            out = labels.select("node", "comp")
            if vertices is not None:
                singles = (
                    vertices.select(F.col(vertices.columns[0]).alias("node"))
                    .join(out.select("node"), "node", "left_anti")
                    .select("node", F.col("node").alias("comp"))
                )
                out = out.union(singles)
            return out
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def _edge_digest(edges: DataFrame) -> tuple[int, int]:
    """Cheap fixpoint probe: (row count, sum of row hashes). Two scalar
    aggregates instead of a full set-difference join per round."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return row.n, row.h


def connected_components_star(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond") — same ``(node, component)`` contract as
    :func:`connected_components`, but O(log² n) rounds instead of
    O(diameter): the operator of choice when dedup chains can be LONG
    (crawl mirrors re-mirrored, quote-of-quote-of-quote), where plain
    min-label propagation needs one round per hop.

    Each round is two groupBy-join passes (one per star op), all
    equi-shuffles on node ids; ``localCheckpoint`` truncates lineage per
    round. Convergence is detected by an (edge-count, hash-sum) digest —
    two scalar aggregates, not a set-difference join. ``vertices`` MUST be
    unique ids — same contract (and same rationale) as
    :func:`connected_components`.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    cur = e.distinct().localCheckpoint(eager=True)
    digest = _edge_digest(cur)
    for _ in range(max_iter):
        # large-star: connect every neighbor v > u to m = min(Γ(u) ∪ {u})
        sym = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        ls = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: orient (a=max, b=min); connect every smaller neighbor
        # and a itself to m = min of a's smaller neighborhood
        ori = ls.select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        )
        m2 = ori.groupBy("a").agg(F.min("b").alias("m"))
        joined = ori.join(m2, "a")
        ss = (
            joined.select(F.col("b").alias("u"), F.col("m").alias("v"))
            .union(joined.select(F.col("a").alias("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_digest = _edge_digest(ss)
        cur = ss
        if new_digest == digest:
            break
        digest = new_digest
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )

    # fixpoint edge set is a union of stars pointing at the component min
    roots = cur.select(F.greatest("u", "v").alias("node"), F.least("u", "v").alias("comp"))
    members = roots.groupBy("node").agg(F.min("comp").alias("comp"))
    root_nodes = members.select(F.col("comp").alias("node"), F.col("comp").alias("comp2")).distinct()
    labels = members.union(
        root_nodes.select("node", F.col("comp2").alias("comp"))
    ).distinct()
    if vertices is not None:
        singles = (
            vertices.select(F.col(vertices.columns[0]).alias("node"))
            .join(labels.select("node"), "node", "left_anti")
            .select("node", F.col("node").alias("comp"))
        )
        labels = labels.union(singles)
    return labels.select("node", "comp")
