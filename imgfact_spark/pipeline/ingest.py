"""Stage 0: document ingest — explode interleaved spans, keep positions.

Input (BASELINE.json input_hint):
    documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)

``posexplode`` materializes the span order as an explicit ``pos`` column —
the per-row invariant (kind, text, media_ref, order) is carried through every
downstream stage and re-verified by re-aggregating with
``array_sort(collect_list(struct(pos, ...)))`` (SURVEY.md §7 hard part 1):
Spark shuffle order is undefined, positions must be data, not order.

Media refs are parsed once here: the reference's directory-as-table layout
``img://TriplelistNNN/<rel>/"<s> <o>"/<n>.jpg`` (README.md:66-84) becomes
typed columns (subset, media_p, media_s, media_o) so every later stage works
on columns, not paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.functions.text import canonical_entity, norm_underscore


def explode_spans(documents: DataFrame) -> DataFrame:
    """→ spans(doc_id, pos, kind, text, media_ref, offset)"""
    return documents.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def media_spans(spans: DataFrame) -> DataFrame:
    """Typed media rows parsed from the path-encoded triple layout.

    → (doc_id, pos, media_ref, subset, media_p, media_s, media_o, img_no)
    """
    parts = F.split(F.regexp_replace("media_ref", r"^img://", ""), "/")
    pair = F.split(F.element_at(parts, 3), " ")
    n_pair = F.size(pair)
    return (
        spans.filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "pos",
            "media_ref",
            F.element_at(parts, 1).alias("subset"),
            F.element_at(parts, 2).alias("media_p"),
            # pair dir is space-separated "<s space form> <o space form>";
            # entity names may themselves contain spaces, so split at the
            # midpoint of the token list (synth emits balanced halves) —
            # the robust production parser keys on the KB vocabulary instead
            # (entity-linking join downstream re-verifies both halves).
            canonical_entity(
                norm_underscore(
                    F.concat_ws(" ", F.slice(pair, 1, (n_pair / 2).cast("int")))
                )
            ).alias("media_s"),
            canonical_entity(
                norm_underscore(
                    F.concat_ws(
                        " ",
                        F.slice(
                            pair,
                            (n_pair / 2).cast("int") + 1,
                            n_pair - (n_pair / 2).cast("int"),
                        ),
                    )
                )
            ).alias("media_o"),
            F.regexp_extract(F.element_at(parts, 4), r"^(\d+)", 1)
            .cast("int")
            .alias("img_no"),
        )
    )


def reassemble_spans(spans: DataFrame) -> DataFrame:
    """Inverse of explode_spans — used by the span-sequence-equality check.

    Ordering comes from the carried ``pos`` column via array_sort on a struct
    with pos first; NEVER from shuffle order.
    """
    return (
        spans.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "kind", "text", "media_ref", "offset"))
            ).alias("_sorted")
        )
        .select(
            "doc_id",
            F.transform(
                "_sorted",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )
