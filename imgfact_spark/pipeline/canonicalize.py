"""Stage 5: entity canonicalization — alias clustering to one representative.

North-rule step: "canonicalizes entities with a connected-components/min-hash
alias-clustering step".

Pipeline:
  1. observed surface forms → deterministic normalization
     (functions/text.canonical_entity: del_bar + underscore/space,
     ptuning.py:88-106 / filter_tuples.py:37 semantics);
  2. near-dup alias edges via MinHash-LSH over character shingles of the
     normalized form (operators/dedup machinery, char-level) — catches
     typo/qualifier variants normalization alone misses;
  3. connected components (hash-min label propagation) → component
     representative = lexicographic min member;
  4. rewrite triples through the alias → representative map (broadcast join;
     the alias dimension is ~|distinct entities|, tiny vs the triple fact
     table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.functions.text import canonical_entity
from imgfact_spark.operators.connected_components import connected_components


def observed_entities(candidates: DataFrame) -> DataFrame:
    return (
        candidates.select(F.col("s").alias("entity"))
        .unionByName(candidates.select(F.col("o").alias("entity")))
        .distinct()
    )


def char_shingle_edges(
    entities: DataFrame, n: int = 3, num_hashes: int = 32, bands: int = 8,
    jaccard_threshold: float = 0.85, min_len: int = 12,
) -> DataFrame:
    """Alias candidate edges between entities whose normalized forms are
    near-identical: char-n-gram MinHash banding, then exact Jaccard verify.

    ``min_len`` gates LSH candidacy: short identifiers (zero-padded ids,
    acronyms) have degenerate shingle sets — e.g. ``Tail_0000`` vs
    ``Tail_0005`` share 6/7 trigrams (Jaccard 0.857) while naming different
    entities — so fuzzy merging only applies to names long enough for the
    n-gram statistics to be meaningful.  Short names still merge via
    normalization edges.

    → edges(src, dst)
    """
    normed = entities.select(
        F.col("entity"),
        F.lower(canonical_entity("entity")).alias("_norm"),
    ).filter(F.length("_norm") >= min_len)
    grams = normed.select(
        "entity",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("_norm") - n, F.lit(0)),
                ),
                lambda i: F.col("_norm").substr(i + 1, F.lit(n)),
            )
        ).alias("shingles"),
    )
    from imgfact_spark.operators.dedup import minhash_signature, minhash_lsh_dup_pairs

    sig = minhash_signature(grams, "entity", num_hashes=num_hashes)
    pairs = minhash_lsh_dup_pairs(
        sig, "entity", bands=bands, rows_per_band=num_hashes // bands
    )
    a = grams.select(F.col("entity").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = grams.select(F.col("entity").alias("id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jac",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jac") >= jaccard_threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return verified


def alias_map(entities: DataFrame, with_lsh: bool = True) -> DataFrame:
    """→ (entity, canonical): every observed entity to its representative.

    Normalization edges (surface → canonical_entity form) always apply;
    LSH near-dup edges optionally extend the components.
    """
    if not with_lsh:
        # pure-normalization aliasing is a star graph around the canonical
        # form — the component representative IS canonical_entity(entity);
        # no iteration needed (the CC loop would converge to the same map
        # after paying shuffles for nothing).
        return entities.select(
            "entity", canonical_entity("entity").alias("canonical")
        )
    norm_edges = entities.select(
        F.col("entity").alias("src"),
        canonical_entity("entity").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    edges = norm_edges.unionByName(char_shingle_edges(entities))
    comp = connected_components(edges)
    # entities with no edges are their own representative
    return (
        entities.join(comp.withColumnRenamed("node", "entity"), "entity", "left")
        .select(
            "entity",
            F.coalesce("component", "entity").alias("canonical"),
        )
    )


def rewrite_triples_norm(triples: DataFrame) -> DataFrame:
    """Rewrite s/o through pure normalization — the no-LSH fast path.

    ``alias_map(with_lsh=False)`` is exactly ``entity → canonical_entity``,
    a pure Column function: applying it directly removes the alias-table
    computation AND the broadcast join from the plan (idempotent on
    already-canonical inputs)."""
    return triples.withColumn("s", canonical_entity("s")).withColumn(
        "o", canonical_entity("o")
    )


def rewrite_triples(
    triples: DataFrame, aliases: DataFrame, broadcast_dim: bool = True
) -> DataFrame:
    """Rewrite s/o through the alias map — required when LSH near-dup edges
    extend components beyond pure normalization.  ``broadcast_dim`` as in
    filter_visual_triples: hint by default, disable at entity scales past
    the broadcast ceiling."""
    am = F.broadcast(aliases) if broadcast_dim else aliases
    return (
        triples.join(
            am.select(F.col("entity").alias("s"), F.col("canonical").alias("_cs")),
            "s",
            "left",
        )
        .join(
            am.select(F.col("entity").alias("o"), F.col("canonical").alias("_co")),
            "o",
            "left",
        )
        .withColumn("s", F.coalesce("_cs", "s"))
        .withColumn("o", F.coalesce("_co", "o"))
        .drop("_cs", "_co")
    )
