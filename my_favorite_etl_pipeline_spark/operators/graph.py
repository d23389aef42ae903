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
long-chain graphs swap in the large-star/small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond"), which this API admits
without signature change.
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
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough);
    ``vertices`` optionally supplies isolated nodes (they become singleton
    components). Raises if the fixpoint is not reached within ``max_iter``.
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
    nodes = sym.select(F.col("u").alias("node")).distinct()
    if vertices is not None:
        nodes = nodes.union(vertices.select(F.col(vertices.columns[0]).alias("node"))).distinct()

    labels = nodes.select("node", F.col("node").alias("comp")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("nb_node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == F.col("nb_node"), "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", "comp")
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
