"""End-to-end KG-construction pipeline: documents → kg_triples + kg_groundings.

Stage DAG (each stage a checkpointed table, resumable; SURVEY.md §3.1):

    documents
      └─ spans            (ingest.explode_spans)
          ├─ media        (ingest.media_spans)
          │    └─ visual_entities   (entity gate, M1)
          └─ mentions     (extract.detect_mentions — pandas-UDF kernel)
               └─ candidates        (extract.link_entities)
                    └─ visual_candidates (J1 semi-joins)
                         └─ [relation whitelist]
                              └─ groundings scored+filtered+topK (M2/M3/W1)
                                   └─ canonicalized kg_triples / kg_groundings

Resume semantics = reference's skip-finished-chunks (inference.py:139-143):
re-running with the same input fingerprint skips committed stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from imgfact_spark.io import TableStore, fingerprint_df, stage
from imgfact_spark.pipeline import canonicalize as canon
from imgfact_spark.pipeline import entity_filter, extract, grounding, ingest, relation_filter


@dataclass
class PipelineConfig:
    min_evidence: int = 1        # reference: 10 (entity_filtering/dataloading.py:21)
    vcc_threshold: float = 0.02
    pair_threshold: float = grounding.PAIR_THRESHOLD
    ent_threshold: float = grounding.ENT_THRESHOLD
    topk: int = grounding.DEFAULT_TOPK
    relation_min_total: int = 0   # reference: 20 (gen_visual_relations.py:29)
    relation_min_count: int = 0   # reference: 50 (gen_sample_tuples.py:9)
    use_lsh_aliases: bool = False  # char-LSH alias edges (slow on tiny data)
    n_subset_partitions: int = 30


@dataclass
class PipelineResult:
    kg_triples: DataFrame
    kg_groundings: DataFrame
    stages: dict[str, DataFrame] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    rel2desc: DataFrame,
    kb_entities: DataFrame,
    store: TableStore,
    cfg: PipelineConfig | None = None,
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    fp = fingerprint_df(documents.select("doc_id"))

    spans = stage(
        store, "spans", fp, lambda: ingest.explode_spans(documents), spark
    )
    media = stage(store, "media", fp, lambda: ingest.media_spans(spans), spark)
    mentions = stage(
        store,
        "mentions",
        fp,
        lambda: extract.detect_mentions(spans, rel2desc),
        spark,
    )
    candidates = stage(
        store,
        "candidates",
        fp,
        lambda: extract.link_entities(mentions, kb_entities),
        spark,
    )
    visual = stage(
        store,
        "visual_entities",
        fp,
        lambda: entity_filter.visual_entities(
            media, cfg.min_evidence, cfg.vcc_threshold
        ),
        spark,
    )
    vis_cand = stage(
        store,
        "visual_candidates",
        fp,
        lambda: entity_filter.filter_visual_triples(candidates, visual),
        spark,
    )

    def _whitelisted():
        ratio = relation_filter.visual_relation_ratio(
            vis_cand, candidates, min_total=cfg.relation_min_total
        )
        wl = relation_filter.select_relations(
            ratio, min_count=cfg.relation_min_count
        )
        return relation_filter.apply_relation_whitelist(vis_cand, wl)

    wl_cand = stage(store, "whitelisted_candidates", fp, _whitelisted, spark)

    def _groundings():
        gc = grounding.grounding_candidates(wl_cand, media)
        scored = grounding.score_groundings(gc)
        filtered = grounding.filter_groundings(
            scored, cfg.pair_threshold, cfg.ent_threshold
        )
        return grounding.topk_groundings(filtered, cfg.topk)

    grounded = stage(store, "groundings", fp, _groundings, spark)

    def _aliases():
        ents = canon.observed_entities(wl_cand)
        return canon.alias_map(ents, with_lsh=cfg.use_lsh_aliases)

    aliases = stage(store, "aliases", fp, _aliases, spark)

    def _kg_triples():
        rewritten = canon.rewrite_triples(
            wl_cand.select("doc_id", "s", "p", "o"), aliases
        )
        return (
            rewritten.groupBy("s", "p", "o")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
            )
            .withColumn(
                "subset",
                F.format_string(
                    "Triplelist%03d",
                    F.pmod(F.xxhash64("s", "p", "o"), F.lit(cfg.n_subset_partitions))
                    + 1,
                ),
            )
        )

    kg_triples = stage(
        store, "kg_triples", fp, _kg_triples, spark, partition_by=["subset"]
    )

    def _kg_groundings():
        rewritten = canon.rewrite_triples(grounded, aliases)
        return rewritten.select(
            "s", "p", "o", "media_ref", "doc_id", "score", "rank", "subset"
        )

    kg_groundings = stage(
        store, "kg_groundings", fp, _kg_groundings, spark, partition_by=["subset"]
    )

    return PipelineResult(
        kg_triples=kg_triples,
        kg_groundings=kg_groundings,
        stages={
            "spans": spans,
            "media": media,
            "mentions": mentions,
            "candidates": candidates,
            "visual_entities": visual,
            "visual_candidates": vis_cand,
            "whitelisted_candidates": wl_cand,
            "groundings": grounded,
            "aliases": aliases,
        },
    )
