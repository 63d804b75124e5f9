"""BM25 ranked retrieval over a document corpus.

The reference retrieves images/sentences for an entity pair by exact
key lookup into pre-crawled pools (imgfact_api/imgfact.py retrieve_*;
dataset_construction feeds them with per-pair crawls).  A text corpus at
engine scale additionally needs ranked lexical retrieval — BM25 is the
standard scoring function (Robertson–Spärck Jones; the Okapi BM25 form
with the +1 idf smoothing used by Lucene/Elasticsearch).

Spark shape — three bounded aggregations, no joins on the corpus side:

  * tokenization + per-doc length are narrow column expressions over the
    scan (same normalization as the dedup shingles — one house
    tokenizer);
  * query terms are filtered INSIDE the token array before the explode,
    so the shuffle after it carries only query-term hits (|Q| ≤ dozens ⇒
    a vanishing fraction of the corpus' tokens at 100 TB);
  * corpus stats (N, avgdl) are one 1-row aggregate, attached by
    broadcast cross-join; per-term document frequencies are ≤|Q| rows,
    broadcast-joined;
  * the per-doc score folds term contributions SEQUENTIALLY over a
    term-sorted array (house determinism rule: Spark F.aggregate ==
    DuckDB list_dot_product), floor-truncated at 1e-6; top-k plans as
    TakeOrdered (bounded heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from imgfact_spark.operators.topk import topk_per_group

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def _tokens(text_col: str):
    """House tokenizer (identical to the dedup shingle normalization)."""
    return F.split(
        F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))), " "
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-k documents by Okapi BM25 for a bag of query terms.

    Returns (id_col, score) with score = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·dl/avgdl)), idf(t) = ln(1 + (N−df+0.5)/(df+0.5)),
    floor-truncated at 1e-6, ties broken on id_col.

    Query terms go through the SAME normalization as the corpus tokenizer
    (strip + lowercase; empty terms dropped) — a raw entity name like
    'Spark' must match the lowercased corpus tokens, not silently miss.
    """
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    toks = _tokens(text_col)
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("dl")
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = base.select(
        id_col,
        "dl",
        F.explode(
            F.filter("_toks", lambda t: t.isin(terms))
        ).alias("term"),
    )
    tf = hits.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    folded = contrib.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", F.col("c").alias("v")))),
                lambda x: x["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("raw")
    )
    return (
        folded.select(
            id_col,
            (F.floor(F.col("raw") * 1e6) / 1e6).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def bm25_topk_queries(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> DataFrame:
    """Top-k documents per query for a RELATION of queries — the serving
    shape of a retrieval layer (``bm25_topk`` takes one literal term bag;
    an inverted-index service answers many).

    ``queries`` is (query_id, terms: array<string>); term bags are
    normalized through the corpus tokenizer (strip+lower, empties dropped,
    set semantics — matching the single-query operator exactly, which is
    pinned as its |queries|=1 special case in tests).

    Scale shape — the corpus-side work is independent of |queries|:

      * the DISTINCT query-term dimension (≤ Σ|terms|, dimension-sized) is
        collapsed to a 1-row sorted array and broadcast onto the scan, so
        the term filter still runs INSIDE the token array BEFORE the
        explode — the post-explode shuffle carries only query-term hits,
        exactly like the single-query plan, regardless of how many queries
        share a term;
      * per-(doc, term) tf and per-term df are computed ONCE and fanned out
        to queries by a broadcast join on the (query_id, term) relation —
        shuffle ∝ query-term hits × queries-per-term, never |docs|×|queries|;
      * per-(query, doc) scores fold term contributions sequentially over
        term-sorted arrays (cross-engine exactness), then per-query top-k
        plans as one WindowGroupLimit (rank state ≤ k per query).

    Returns (query_id, id_col, score, rank).
    """
    qterms = queries.select(
        query_id_col,
        F.explode(
            F.array_distinct(
                F.filter(
                    F.transform(F.col(terms_col), lambda t: F.trim(F.lower(t))),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )
    # 1-row sorted term-dimension array: broadcast onto the corpus scan so
    # the filter happens inside the token array, before the explode
    qarr = qterms.select("term").distinct().agg(
        F.array_sort(F.collect_set("term")).alias("_qterms")
    )
    toks = _tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("dl"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    hits = base.crossJoin(F.broadcast(qarr)).select(
        id_col,
        "dl",
        F.explode(
            F.filter("_toks", lambda t: F.array_contains(F.col("_qterms"), t))
        ).alias("term"),
    )
    tf = hits.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("dfreq"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
                    / (F.col("dfreq") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                    )
                )
            ).alias("c"),
        )
    )
    folded = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("term", F.col("c").alias("v")))
                    ),
                    lambda x: x["v"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("raw")
        )
        .select(
            query_id_col,
            id_col,
            (F.floor(F.col("raw") * 1e6) / 1e6).alias("score"),
        )
    )
    return topk_per_group(
        folded,
        keys=[query_id_col],
        order_by=[F.desc("score")],
        k=k,
        tiebreak=[id_col],
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 2,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the standard corpus
    keyword/topic-signal extractor (tf · ln(N/df), raw counts, natural
    log — the classic formulation).

    Returns (id_col, term, tf, dfreq, score, rank) with score
    floor-truncated at 1e-6 and rank ties broken on term asc.

    Scale shape — three shuffles, each on a different bounded key:

      * per-(doc, term) tf: explode the token array → partial-agg count
        (map-side combine absorbs within-partition repeats, so shuffle
        rows ≤ distinct (doc, term) pairs, not token instances);
      * per-term df via a COUNT window over the tf relation partitioned
        by term — reuses the aggregated (doc, term) rows instead of a
        vocab-sized self-join (a web-scale vocabulary is NOT
        broadcastable; this keeps df computation one hash exchange);
      * corpus N is a 1-row aggregate, broadcast;
      * per-doc top-k plans as WindowGroupLimit (bounded heap per doc).

    Engine extension: the reference mines entity/relation surface forms
    from pre-aligned abstracts (no corpus-statistics mining); a from-crawl
    corpus needs the statistical keyword signal upstream
    (SURVEY.md §2 training-data tier).
    """
    toks = _tokens(text_col)
    terms = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(toks, lambda t: F.length(t) >= min_term_len)
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    w_term = Window.partitionBy("term")
    stats = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("dfreq", F.count("*").over(w_term))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            F.floor(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dfreq"))
                * 1e6
            )
            / 1e6,
        )
    )
    return topk_per_group(
        scored, keys=[id_col], order_by=[F.desc("score")], k=k,
        tiebreak=["term"],
    ).select(id_col, "term", "tf", "dfreq", "score", "rank")


def inverted_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    segment_size: int = 10000,
    min_df: int = 1,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Segmented inverted-index construction: → (term, df, segment,
    postings) where ``postings`` is the flat-serialized, doc-sorted
    posting list ``"doc:tf,doc:tf,…"`` of one segment.

    The materialized index behind ranked retrieval (the reference serves
    its pools by exact key lookup — imgfact_api/imgfact.py retrieve_*;
    BM25 above computes tf/df on the fly; this operator persists them as
    the index artifact a serving system loads).

    Scale shape — exactly two exchanges, both on bounded rows:
      * a map-side-combining (term, doc) tf aggregation (shuffle rows ≤
        distinct (term, doc) pairs, never token instances);
      * global df per term via a COUNT window over the tf relation
        partitioned by term — the same never-a-vocab-join device as
        :func:`tfidf_keywords` above (one term-keyed exchange; the final
        (term, df, segment) aggregation reuses that partitioning, so no
        third exchange and the tf pipeline executes exactly once —
        a review pass caught the first version's join-back re-running
        the corpus explode twice);
      * **posting lists are sharded by doc-hash into
        ceil(df / segment_size) segments**, so a stopword's postings
        never funnel into one task or serialize into one row — the
        per-row and per-task bound is ~``segment_size`` in expectation
        regardless of term skew (hub terms ride the segment fan-out,
        not AQE mercy);
      * within a segment, postings sort LEXICOGRAPHICALLY on the
        stringified doc id and serialize FLAT (``doc:tf``) —
        deterministic and driver-canonicalizable (nested array/struct
        cells error there); consumers that need numeric id order must
        zero-pad ids or re-sort (the contract is string order).

    ``hash_mode='md5'`` uses the engine-portable 60-bit md5 key for the
    segment assignment (DuckDB-replayable: ``('0x'||substr(md5(…),1,15))
    ::BIGINT % n_seg``); ``xxhash64`` is the production default.  Empty
    tokens (blank docs normalize to ['']) are dropped on both engines.
    """
    from imgfact_spark.functions.text import normalized_tokens
    from imgfact_spark.operators.sampling import seeded_key
    from imgfact_spark.operators.util import ensure_parallelism

    if segment_size < 1:
        raise ValueError("segment_size must be >= 1")
    tf = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).cast("string").alias("_doc"),
            F.explode(normalized_tokens(text_col)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "_doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    withdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    if min_df > 1:
        withdf = withdf.filter(F.col("df") >= min_df)
    n_seg = F.ceil(F.col("df") / F.lit(float(segment_size))).cast("bigint")
    if hash_mode == "md5":
        key = seeded_key("idx", F.col("_doc"))
    elif hash_mode == "xxhash64":
        # pmod (not abs+%) — ANSI abs throws on Long.MIN_VALUE
        key = F.xxhash64(F.lit("idx"), F.col("_doc"))
    else:
        raise ValueError(f"unknown hash_mode: {hash_mode!r}")
    return (
        withdf.withColumn("segment", F.pmod(key, n_seg).cast("int"))
        .groupBy("term", "df", "segment")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_doc", "tf"))),
                    lambda x: F.concat_ws(
                        ":", x["_doc"], x["tf"].cast("string")
                    ),
                ),
            ).alias("postings")
        )
        .select("term", "df", "segment", "postings")
    )
