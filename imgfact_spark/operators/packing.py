"""Sequence packing — concatenate a (shuffled) corpus and split it into
fixed-length training sequences, the standard LLM-pretraining packing step.

The reference materializes its training corpus single-node and lets the
data loader chunk it (dataset_construction feeds line-oriented TSVs into
per-GPU loaders; CPgen.py:85-87 shuffles the whole corpus in one process).
At 100 TB neither the shuffle nor the concatenation fits one machine; this
operator re-expresses "shuffle → concatenate → split every ``seq_len``
tokens" as a distributed plan whose output is BIT-IDENTICAL to the
single-process result:

  1. a deterministic TOTAL order over documents (caller-supplied — usually
     the md5-seeded shuffle key from operators/sampling.seeded_key WITH
     the unique id appended as the final tie-break: 60-bit keys collide at
     web scale, and only a total order makes offsets well-defined);
  2. the global token offset of every document = an exact distributed
     prefix sum: range-partition on the order key, per-partition running
     sums (windows bounded by one range partition — never a global
     window), partition offsets from a ≤ num_partitions-row count
     aggregate joined back broadcast (the position-minting shape of
     operators/zip_join.with_position, generalized from COUNT to SUM);
  3. each document spans tokens [start, start + n); the sequences it
     touches are floor(start/L) … floor((start+n-1)/L), emitted with an
     explode over that (usually 1-2 element) range — a document fans out
     only to the sequences it actually straddles, so the output is
     O(rows + total_tokens/L), never quadratic.

Shuffle traffic: two balanced exchanges of (id, n_tokens) — the text
itself never moves; the caller joins fragments back to payloads by id.
Skew-free by construction (range partitioning on a hash-uniform key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_token_offset(
    df: DataFrame,
    n_tokens_col: str,
    order_by: list[Column | str],
    offset_col: str = "token_offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global exclusive prefix sum of ``n_tokens_col`` in ``order_by``
    order, without a single-partition window (distributed-prefix-sum shape
    of operators/zip_join.with_position)."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    ranged = df.repartitionByRange(n, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    # ROWS frame, not the default RANGE frame: RANGE includes ORDER-BY
    # peers, so tied keys would absorb each other's counts (overlapping /
    # missing offsets).  ROWS makes ties non-overlapping; as with
    # with_position, the order must still be TOTAL for the result to be
    # deterministic — callers append a unique id as the last order key.
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(n_tokens_col)).over(w)

    totals = ranged.groupBy("_pid").agg(
        F.sum(n_tokens_col).cast("long").alias("_tot")
    )
    a = totals.select(F.col("_pid"))
    b = totals.select(F.col("_pid").alias("_qid"), "_tot")
    offsets = (
        a.join(F.broadcast(b), F.col("_qid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_tot"), F.lit(0)).cast("long").alias("_off"))
    )

    return (
        ranged.withColumn("_run", run)
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            offset_col,
            (F.col("_off") + F.col("_run") - F.col(n_tokens_col)).cast("long"),
        )
        .drop("_pid", "_run", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    order_by: list[Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack documents into fixed-length training sequences.

    Returns one row per (sequence, document-fragment):
      (seq_id, <id_col>, doc_offset, seq_offset, frag_tokens)
    where ``doc_offset`` is the fragment's first token within the document
    and ``seq_offset`` its first token within the sequence.  Every sequence
    except the last holds exactly ``seq_len`` tokens; every document's
    tokens are assigned exactly once, in order — the distributed result is
    identical to concatenating the corpus in ``order_by`` order and
    slicing.  Zero-token documents are dropped (they contribute nothing to
    any sequence)."""
    assert seq_len >= 1
    L = F.lit(seq_len).cast("long")
    nt = F.col(n_tokens_col).cast("long")
    with_start = with_token_offset(
        df.filter(nt > 0),
        n_tokens_col,
        order_by,
        offset_col="_start",
        num_partitions=num_partitions,
    )
    end = F.col("_start") + nt  # exclusive
    first_seq = F.floor(F.col("_start") / L)
    last_seq = F.floor((end - 1) / L)
    frag = with_start.select(
        F.col(id_col),
        nt.alias("_n"),
        F.col("_start"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    frag_lo = F.greatest(F.col("_start"), seq_lo)
    frag_hi = F.least(F.col("_start") + F.col("_n"), seq_lo + L)
    return frag.select(
        F.col("seq_id"),
        F.col(id_col),
        (frag_lo - F.col("_start")).cast("long").alias("doc_offset"),
        (frag_lo - seq_lo).cast("long").alias("seq_offset"),
        (frag_hi - frag_lo).cast("long").alias("frag_tokens"),
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking: slice each document's token stream into
    fixed-size chunks with optional overlap — the per-DOCUMENT companion
    of :func:`pack_sequences` (packing concatenates short docs; chunking
    splits long ones; a pretraining pipeline runs chunk → pack).

    ``stride`` (default ``chunk_tokens`` = disjoint chunks) is the step
    between chunk starts; ``stride < chunk_tokens`` overlaps chunks by
    ``chunk_tokens − stride`` tokens, the standard sliding-context form.
    Chunk count = 1 + ceil(max(n − chunk, 0)/stride), so every token is
    covered and no start lies beyond the text.  Blank documents emit no
    rows.  Returns (id_col, chunk_id, n_tokens, chunk_text).

    Scale shape: pure map-only array algebra — tokenize once, build the
    (usually tiny) start-index array with ``sequence``, explode, slice —
    NO shuffle anywhere: the whole operator fuses into the scan, and the
    integer chunk arithmetic is engine-exact (DuckDB-replicable).  The
    tokenizer is the house ``normalized_tokens`` contract.
    """
    from imgfact_spark.functions.text import blank_text, normalized_tokens

    if stride is None:
        stride = chunk_tokens
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError(
            f"need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}"
        )
    toks = normalized_tokens(F.col(text_col))
    n = F.when(blank_text(F.col(text_col)), F.lit(0)).otherwise(F.size(toks))
    # ceil over integers: floor((x + stride - 1) / stride), exact bigint
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ).cast("int")
    )
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc")
    )
    piece = F.slice(
        "_toks", F.col("chunk_id") * stride + 1, F.lit(chunk_tokens)
    )
    return (
        base.filter(F.col("_nc") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(piece).alias("n_tokens"),
            F.concat_ws(" ", piece).alias("chunk_text"),
        )
    )
