"""Sequence packing vs an independent single-process python oracle."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from imgfact_spark.operators.packing import pack_sequences, with_token_offset
from imgfact_spark.operators.sampling import seeded_key


def _md5key(seed, *parts) -> int:
    joined = "\x1f".join([str(seed)] + [str(p) for p in parts])
    return int(hashlib.md5(joined.encode()).hexdigest()[:15], 16)


def _oracle_pack(docs: dict[int, int], seed: int, L: int) -> set[tuple]:
    """Shuffle→concatenate→slice in one process: the semantics the
    distributed operator must reproduce bit-for-bit."""
    order = sorted(
        (i for i, n in docs.items() if n > 0), key=lambda i: (_md5key(seed, i), i)
    )
    out, start = set(), 0
    for i in order:
        n = docs[i]
        for s in range(start // L, (start + n - 1) // L + 1):
            lo, hi = max(start, s * L), min(start + n, (s + 1) * L)
            out.add((s, i, lo - start, lo - s * L, hi - lo))
        start += n
    return out


@pytest.fixture(scope="module")
def docs(spark):
    # lengths exercise every edge: exact multiples of L, 1-token docs,
    # zero-token docs (dropped), and a doc far longer than L (straddles
    # many sequences)
    lens = {i: (i * 29) % 57 for i in range(160)}
    lens[7], lens[40], lens[71], lens[99] = 64, 0, 1, 500
    df = spark.createDataFrame(
        [(i, n) for i, n in lens.items()], "doc_id long, n_tokens long"
    )
    return df, lens


def _run(df, L=64, parts=None):
    rows = pack_sequences(
        df,
        "doc_id",
        "n_tokens",
        seq_len=L,
        order_by=[seeded_key(13, "doc_id"), F.col("doc_id")],
        num_partitions=parts,
    ).collect()
    return {
        (r.seq_id, r.doc_id, r.doc_offset, r.seq_offset, r.frag_tokens)
        for r in rows
    }


def test_pack_matches_single_process_oracle(docs):
    df, lens = docs
    assert _run(df) == _oracle_pack(lens, seed=13, L=64)


def test_pack_invariants(docs):
    df, lens = docs
    got = sorted(_run(df))
    total = sum(lens.values())
    # every sequence but the last holds exactly L tokens, fragments tile it
    per_seq: dict[int, list] = {}
    for s, i, do, so, n in got:
        per_seq.setdefault(s, []).append((so, n))
    last = max(per_seq)
    for s, frags in per_seq.items():
        frags.sort()
        assert frags[0][0] == 0
        for (a, na), (b, _) in zip(frags, frags[1:]):
            assert a + na == b, "fragments must tile the sequence gaplessly"
        width = frags[-1][0] + frags[-1][1]
        assert width == (64 if s != last else total - last * 64)
    # every document's tokens are assigned exactly once, in order
    per_doc: dict[int, list] = {}
    for s, i, do, so, n in got:
        per_doc.setdefault(i, []).append((do, n))
    assert set(per_doc) == {i for i, n in lens.items() if n > 0}
    for i, frags in per_doc.items():
        frags.sort()
        assert frags[0][0] == 0
        for (a, na), (b, _) in zip(frags, frags[1:]):
            assert a + na == b
        assert frags[-1][0] + frags[-1][1] == lens[i]


def test_pack_partitioning_invariance(docs):
    df, _ = docs
    assert _run(df) == _run(df.repartition(7), parts=3)


def test_token_offset_is_exact_prefix_sum(docs):
    df, lens = docs
    got = {
        r.doc_id: r.token_offset
        for r in with_token_offset(
            df, "n_tokens", [seeded_key(13, "doc_id"), F.col("doc_id")]
        ).collect()
    }
    order = sorted(lens, key=lambda i: (_md5key(13, i), i))
    want, acc = {}, 0
    for i in order:
        want[i] = acc
        acc += lens[i]
    assert got == want


def test_token_offset_tied_keys_never_overlap(spark):
    """Regression: the default RANGE window frame absorbed ORDER-BY peers,
    so tied order keys produced overlapping/missing offsets (no row at 0).
    With the ROWS frame ties tile the token space exactly, whatever their
    within-tie order."""
    df = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 100), (3, 30, 200)], "id long, n long, k long"
    )
    rows = with_token_offset(df, "n", [F.col("k")], offset_col="off").collect()
    got = sorted((r.off, r.off + r.n) for r in rows)
    assert got[0][0] == 0
    for (a0, a1), (b0, _) in zip(got, got[1:]):
        assert a1 == b0, f"offsets must tile gaplessly: {got}"
    assert got[-1][1] == 60


def test_pack_plan_has_no_global_window_or_cartesian(docs):
    df, _ = docs
    out = pack_sequences(
        df, "doc_id", "n_tokens", 64,
        order_by=[seeded_key(13, "doc_id"), F.col("doc_id")],
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" in plan
    # the prefix-sum windows are per-range-partition; nothing may funnel
    # the fact data through one task
    assert "Exchange SinglePartition" not in plan


def test_chunk_documents_matches_python_twin(spark):
    """chunk_documents == a python slicing twin: exact chunk boundaries,
    overlap contract (stride < chunk shares chunk-stride tokens), full
    token coverage, disjoint-mode reconstruction, blank docs emit nothing,
    bad params raise."""
    import re

    import pytest as _pytest

    from imgfact_spark.operators.packing import chunk_documents

    texts = [
        (0, " ".join(f"t{i}" for i in range(150))),   # 150 tokens: 4 chunks @64/48
        (1, " ".join(f"u{i}" for i in range(64))),    # exactly one chunk
        (2, " ".join(f"v{i}" for i in range(65))),    # one token over: 2 chunks
        (3, "single"),
        (4, ""),
        (5, "  \t "),
        (6, "A  B\tC\nD " * 20),                       # messy whitespace
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    for chunk, stride in ((64, 48), (64, 64), (10, 3)):
        got = {
            (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
            for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
        }
        want = {}
        for did, text in texts:
            toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
            if toks == [""]:
                continue
            n = len(toks)
            nc = 1 + max(0, -(-(max(n - chunk, 0)) // stride))
            for cid in range(nc):
                piece = toks[cid * stride: cid * stride + chunk]
                want[(did, cid)] = (len(piece), " ".join(piece))
        assert got == want, (chunk, stride)
        # coverage: union of chunk spans == all token indices
        for did, text in texts:
            toks = re.sub(r"\s+", " ", text).strip().lower().split(" ")
            if toks == [""]:
                continue
            covered = set()
            for (d, cid), (npc, _) in want.items():
                if d == did:
                    covered |= set(range(cid * stride, cid * stride + npc))
            assert covered == set(range(len(toks))), (did, chunk, stride)

    # disjoint mode reconstructs the token stream exactly
    rows = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(df, chunk_tokens=64, stride=64)
        .filter("doc_id = 0").collect()
    )
    assert " ".join(t for _, t in rows).split(" ") == [
        f"t{i}" for i in range(150)
    ]

    for bad in ((0, None), (64, 0), (48, 64)):
        with _pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=bad[0], stride=bad[1])
