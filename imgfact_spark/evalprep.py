"""Eval-set preparation over the materialized KG — the generate.sh tier.

The reference fans out 9 ``*_prepare/_setup`` scripts
(eval_and_app/generate.sh:1-42) to build masked-prediction datasets in a
``predict_{s,p,o} × {spo,s,p,o,messy}`` namespace (README.md:158-160).
Each is a composition of operators this engine already provides; this
module wires them into the same products as DataFrame transforms:

  * pair table with explicit positions  — data.source/data.prefix analogue
  * first-seen dense target ids         — prepare_data.py:27-39 (A11/J7)
  * template-masked model inputs        — prepare_data.py:62-75 (P13)
  * train-vocabulary test filter        — prepare_data.py:59-75 (P14)
  * class-balancing oversample          — p_spo_setup.py:84-89 (A8)
  * cluster-aware messy variant         — messy_prepare_data.py:54-73 (J9)
  * deterministic train/dev/test split  — seeded hash, not file order
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imgfact_spark.operators.balance import oversample_balance
from imgfact_spark.operators.messy_swap import messy_swap
from imgfact_spark.operators.zip_join import with_position

MASK = "[MASK]"


def build_pairs(groundings: DataFrame) -> DataFrame:
    """→ (line_no, s, p, o, img_path): one row per grounded image, ordered
    deterministically (the fixture files' line order becomes an explicit
    column — SURVEY.md §7 hard part 3).  Positions are minted with the
    distributed partition-offset scheme (operators/zip_join.with_position),
    not a global window — safe over the full groundings table."""
    return with_position(
        groundings.select("s", "p", "o", F.col("media_ref").alias("img_path")),
        order_by=["s", "p", "o", "img_path"],
        pos_col="line_no",
    )


def target_label_ids(pairs: DataFrame) -> DataFrame:
    """First-seen dense ids over head then tail entities
    (prepare_data.py:27-39: ``label[ent] = label_cnt++`` in scan order).

    → (entity, label_id), ids 0..n-1 dense, deterministic.
    """
    firsts = (
        pairs.select(F.col("s").alias("entity"), (F.col("line_no") * 2).alias("_ord"))
        .unionByName(
            pairs.select(
                F.col("o").alias("entity"), (F.col("line_no") * 2 + 1).alias("_ord")
            )
        )
        .groupBy("entity")
        .agg(F.min("_ord").alias("_first"))
    )
    return with_position(
        firsts, order_by=["_first", "entity"], pos_col="label_id"
    ).select("entity", F.col("label_id").cast("int").alias("label_id"))


def masked_inputs(
    pairs: DataFrame, rel2desc: DataFrame, predict: str = "o"
) -> DataFrame:
    """Template-filled inputs with the predicted slot masked
    (prepare_data.py:62-75: ``template.format('[MASK]', o)`` /
    ``format(s, '[MASK]')``).

    → (line_no, s, p, o, img_path, input_text, label_entity)
    """
    assert predict in ("s", "o")
    tmpl = F.broadcast(rel2desc.select("p", "template"))
    joined = pairs.join(tmpl, "p")
    # format_string needs a literal pattern and templates vary per relation,
    # so split the two-slot template into pre/mid/post around its '{}'
    # markers (pure Column string algebra, no UDF):
    #   pre  = text before 1st slot; rest = after it
    #   mid  = text between slots;   post = after 2nd slot
    first_arg = F.lit(MASK) if predict == "s" else F.translate("s", "_", " ")
    second_arg = F.translate("o", "_", " ") if predict == "s" else F.lit(MASK)
    pre = F.substring_index("template", "{}", 1)
    rest = F.substring("template", F.length(pre) + F.lit(3), F.lit(1 << 20))
    mid = F.substring_index(rest, "{}", 1)
    post = F.substring(rest, F.length(mid) + F.lit(3), F.lit(1 << 20))
    input_text = F.concat(pre, first_arg, mid, second_arg, post)
    label = F.col("s") if predict == "s" else F.col("o")
    return joined.select(
        "line_no",
        "s",
        "p",
        "o",
        "img_path",
        input_text.alias("input_text"),
        label.alias("label_entity"),
    )


def train_vocab_filter(test: DataFrame, train: DataFrame, predict: str = "o") -> DataFrame:
    """Keep test rows whose target entity appeared in train (P14,
    prepare_data.py:59-75 head_entity/train_o_set)."""
    col = "s" if predict == "s" else "o"
    vocab = train.select(F.col(col).alias(col)).distinct()
    return test.join(F.broadcast(vocab), col, "left_semi")


def balance_by_relation(train: DataFrame) -> DataFrame:
    """A8 oversample so every relation reaches ~the majority count."""
    return oversample_balance(train, "p")


def messy_variant(pairs: DataFrame, rel_cluster: DataFrame) -> DataFrame:
    """J9: swap each row's image with one from a different relation
    cluster (messy_prepare_data.py:54-73)."""
    rc = F.broadcast(rel_cluster.select("p", "cluster_id"))
    with_cluster = pairs.join(rc, "p", "left").fillna(-1, subset=["cluster_id"])
    return messy_swap(with_cluster, img_col="img_path", cluster_col="cluster_id")


def split_sets(
    pairs: DataFrame, weights=(0.7, 0.15, 0.15), seed: int = 42
) -> dict[str, DataFrame]:
    """Deterministic train/dev/test split by seeded hash of the pair key
    (replaces the reference's pre-split fixture files; disjoint + covering
    by construction).

    The hash is the md5 hex prefix compared against weight thresholds
    rendered as 15-hex-digit strings — a pure string comparison that DuckDB
    reproduces verbatim (the repo's cross-engine seeded primitive), unlike
    the round-1 xxhash64 variant which only Spark could compute.
    """
    key = F.substring(
        F.md5(F.concat_ws("\x1f", F.lit(str(seed)), "s", "p", "o", "img_path")),
        1, 15,
    )
    t1 = format(int(weights[0] * 16**15), "015x")
    t2 = format(int((weights[0] + weights[1]) * 16**15), "015x")
    tagged = pairs.withColumn(
        "_split",
        F.when(key < t1, "train").when(key < t2, "dev").otherwise("test"),
    )
    return {
        name: tagged.filter(F.col("_split") == name).drop("_split")
        for name in ("train", "dev", "test")
    }
