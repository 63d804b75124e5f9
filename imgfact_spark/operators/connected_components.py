"""Connected components via iterative hash-min label propagation.

Used for entity canonicalization: the alias graph (surface-form ↔ canonical
form ↔ near-dup cluster edges from MinHash banding) is resolved to one
representative per component (SURVEY.md §7 step 7 — the north rule's
entity-level re-expression of the reference's per-triplet dedup,
dataset_construction/clustering/cluster.py).

Algorithm (large-star/small-star simplified to hash-min, the standard
no-GraphFrames approach): every node starts labeled with itself; each
iteration every node adopts the min label in its neighborhood; fixed point
when no label changes.  Converges in O(diameter) rounds; alias graphs have
tiny diameter (stars around a canonical form), typically 2-3 rounds.

Determinism: min() is total on strings → partitioning-invariant result.
Each round is one shuffle (groupBy node); ``localCheckpoint`` truncates the
growing lineage so round N does not replay rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """→ DataFrame(node string, component string) — component = min node id
    in the node's connected component."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # candidate label for each node: min over own label and neighbors'.
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    else:
        converged = False
    if not converged:
        # hash-min propagates one hop per round: a component with diameter
        # > max_iter exits here with SPLIT labels — for a dedup consumer
        # that is silent under-dedup.  Surface it loudly (r6 ADVICE item);
        # callers needing a hard stop can treat the warning as an error
        # via warnings.simplefilter.
        import warnings

        warnings.warn(
            "connected_components: convergence UNCONFIRMED after "
            f"max_iter={max_iter} rounds (the final round still changed "
            "labels — either the fixpoint landed exactly on the last "
            f"round, or components with diameter > {max_iter} are split); "
            "raise max_iter to confirm",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels
