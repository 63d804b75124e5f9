"""Deterministic synthesis of the pipeline input: an interleaved text+media
document table with the authoritative shape (BASELINE.json input_hint):

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int32>>

Facts from a fixture KB (vocabulary modeled on the reference's
eval_and_app/rel2desc.txt templates and data.source triples) are planted into
text spans; media spans referencing the planted entity pairs are interleaved
(``img://TriplelistNNN/rel/"s o"/N.jpg`` — the reference's directory-as-table
layout, README.md:66-84).  Alias variants (underscore/space flips and
parenthetical qualifiers per ptuning.py:88-106) and distractor spans are
mixed in, plus one deliberately 100×-skewed head entity for skew tests.

Everything is a pure function of (seed, doc_id): generation runs distributed
via ``mapInPandas`` over ``spark.range`` with NO driver-side materialization,
so the same code synthesizes 100 docs for unit tests or 10^8+ for bench —
and the ground truth for any doc can be recomputed independently.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Fixture KB — relation vocabulary with two-slot templates (rel2desc shape).
# --------------------------------------------------------------------------

REL_TEMPLATES: list[tuple[str, str, str]] = [
    ("formerTeam", "{}'s former team is {}.", "former team"),
    ("birthPlace", "{} was born in {}.", "birth place"),
    ("deathPlace", "{} died in {}.", "death place"),
    ("almaMater", "{} graduated from {}.", "alma mater"),
    ("employer", "{} works for {}.", "employer"),
    ("spouse", "{} is married to {}.", "spouse"),
    ("child", "{} is the parent of {}.", "child"),
    ("foundedBy", "{} was founded by {}.", "founder"),
    ("headquarter", "{} is headquartered in {}.", "headquarters"),
    ("capital", "{} has its capital at {}.", "capital"),
    ("author", "{} was written by {}.", "author"),
    ("director", "{} was directed by {}.", "director"),
    ("starring", "{} stars {}.", "starring"),
    ("successor", "{} was succeeded by {}.", "successor"),
    ("predecessor", "{} was preceded by {}.", "predecessor"),
    ("instrument", "{} plays the {}.", "instrument"),
    ("genre", "{} performs {}.", "genre"),
    ("award", "{} received the {}.", "award"),
    ("league", "{} competes in the {}.", "league"),
    ("nationality", "{} holds citizenship of {}.", "nationality"),
]

RELATIONS = [r for r, _, _ in REL_TEMPLATES]

N_HEADS = 400
N_TAILS = 300
KB_SIZE = 1200
SKEW_HEAD = "Head_0000"  # planted 100×-skewed head entity
SKEW_PROB = 0.25  # fraction of fact draws routed to the skew block
N_SUBSETS = 30

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("s", T.StringType(), False),
        T.StructField("p", T.StringType(), False),
        T.StructField("o", T.StringType(), False),
        T.StructField("n_media", T.IntegerType(), False),
    ]
)


def build_kb(seed: int = 42) -> pd.DataFrame:
    """Deterministic KB triples (s underscore-form, p, o underscore-form).

    The first block of triples all share the skewed head entity so that
    skew-routed draws concentrate on one groupBy key.
    """
    rng = np.random.RandomState(seed)
    heads = [f"Head_{i:04d}" for i in range(N_HEADS)]
    tails = [f"Tail_{j:04d}" for j in range(N_TAILS)]
    rows = []
    seen = set()
    # skew block: one head, many (p, o)
    skew_block = max(40, KB_SIZE // 20)
    while len(rows) < skew_block:
        p = RELATIONS[rng.randint(len(RELATIONS))]
        o = tails[rng.randint(N_TAILS)]
        key = (SKEW_HEAD, p, o)
        if key not in seen:
            seen.add(key)
            rows.append(key)
    while len(rows) < KB_SIZE:
        s = heads[rng.randint(1, N_HEADS)]
        p = RELATIONS[rng.randint(len(RELATIONS))]
        o = tails[rng.randint(N_TAILS)]
        key = (s, p, o)
        if key not in seen:
            seen.add(key)
            rows.append(key)
    return pd.DataFrame(rows, columns=["s", "p", "o"])


def rel2desc_pdf() -> pd.DataFrame:
    return pd.DataFrame(REL_TEMPLATES, columns=["p", "template", "label"])


# --------------------------------------------------------------------------
# Surface-form aliasing (what the pipeline must undo).
# --------------------------------------------------------------------------

_QUALIFIERS = ["(footballer)", "(band)", "(1999 film)", "(disambiguation)"]


def surface_form(entity: str, variant: int) -> str:
    """Alias variant of an underscore-form entity for embedding in text.

    0 → plain space form; 1 → space form + parenthetical qualifier;
    2 → underscore form left as-is (appears in sloppy text).
    All variants canonicalize back to ``entity`` via
    functions.text.canonical_entity.
    """
    space = entity.replace("_", " ")
    if variant == 1:
        q = _QUALIFIERS[sum(entity.encode()) % len(_QUALIFIERS)]
        return f"{space} {q}"
    if variant == 2:
        return entity
    return space


_DISTRACTORS = [
    "The weather was unremarkable throughout the season.",
    "Several unrelated events occurred in the meantime.",
    "No further details were recorded by observers.",
    "Archive footage exists but remains uncatalogued.",
    "Local reports disagreed about minor details.",
]


def _doc_rng(seed: int, doc_id: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + doc_id * 7_919) % (2**31 - 1))


def _gen_one_doc(
    seed: int, doc_id: int, kb: pd.DataFrame, skew_block: int,
    skew_prob: float = SKEW_PROB,
):
    """Pure function (seed, doc_id) → (spans, truth facts)."""
    rng = _doc_rng(seed, doc_id)
    n_facts = rng.randint(1, 4)
    idxs = []
    for _ in range(n_facts):
        if rng.rand() < skew_prob:
            idxs.append(rng.randint(0, skew_block))
        else:
            idxs.append(rng.randint(0, len(kb)))
    idxs = list(dict.fromkeys(idxs))  # dedupe, keep order

    spans: list[tuple[str, str | None, str | None, int]] = []
    truth: list[tuple[str, str, str, int]] = []
    offset = 0

    def emit_text(text: str) -> None:
        nonlocal offset
        spans.append(("text", text, None, offset))
        offset += len(text) + 1

    def emit_media(ref: str) -> None:
        nonlocal offset
        spans.append(("media", None, ref, offset))
        offset += 1

    if rng.rand() < 0.5:
        emit_text(_DISTRACTORS[rng.randint(len(_DISTRACTORS))])

    svals, pvals, ovals = kb["s"].values, kb["p"].values, kb["o"].values
    tmpl = {p: t for p, t, _ in REL_TEMPLATES}
    for i in idxs:
        s, p, o = svals[i], pvals[i], ovals[i]
        s_sf = surface_form(s, rng.randint(0, 3))
        o_sf = surface_form(o, rng.randint(0, 3))
        emit_text(tmpl[p].format(s_sf, o_sf))
        n_media = int(rng.randint(0, 4))
        subset = (i % N_SUBSETS) + 1
        for n in range(n_media):
            # reference pair-dir layout: underscore-form entities joined by
            # ONE space — `Triplelist014/formerTeam/Bryan_Muir Tampa_Bay_Lightning/8.jpg`
            # (eval_and_app/data.prefix; README.md:66-84)
            emit_media(f"img://Triplelist{subset:03d}/{p}/{s} {o}/{n}.jpg")
        if rng.rand() < 0.3:
            emit_text(_DISTRACTORS[rng.randint(len(_DISTRACTORS))])
        truth.append((s, p, o, n_media))

    if rng.rand() < 0.2:  # distractor media span with no co-occurring fact
        emit_media(f"img://Triplelist{rng.randint(1, N_SUBSETS + 1):03d}/noise/none/0.jpg")

    return spans, truth


# --------------------------------------------------------------------------
# Distributed generation
# --------------------------------------------------------------------------


def synth_documents(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None,
    skew_prob: float = SKEW_PROB,
) -> DataFrame:
    """Interleaved-documents table, generated distributed + deterministic.

    ``skew_prob`` routes that fraction of fact draws to the single-head skew
    block (default 0.25 ⇒ the head entity appears in ~35% of docs); raise it
    to stress-test skew handling (bench kg_construct_skew uses 0.75)."""
    kb = build_kb(seed)
    skew_block = max(40, KB_SIZE // 20)
    base = spark.range(0, n_docs, numPartitions=partitions or max(8, n_docs // 50_000))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["id"]:
                spans, _ = _gen_one_doc(seed, int(did), kb, skew_block, skew_prob)
                out.append(
                    (
                        f"doc_{int(did):09d}",
                        [
                            {"kind": k, "text": t, "media_ref": m, "offset": off}
                            for k, t, m, off in spans
                        ],
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "spans"])

    return base.mapInPandas(gen, schema=DOC_SCHEMA)


def synth_truth(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None,
    skew_prob: float = SKEW_PROB,
) -> DataFrame:
    """Ground-truth planted facts per doc — same pure function, truth side."""
    kb = build_kb(seed)
    skew_block = max(40, KB_SIZE // 20)
    base = spark.range(0, n_docs, numPartitions=partitions or max(8, n_docs // 50_000))

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["id"]:
                _, truth = _gen_one_doc(seed, int(did), kb, skew_block, skew_prob)
                for s, p, o, n_media in truth:
                    out.append((f"doc_{int(did):09d}", s, p, o, n_media))
            yield pd.DataFrame(out, columns=["doc_id", "s", "p", "o", "n_media"])

    return base.mapInPandas(gen, schema=TRUTH_SCHEMA)


def kb_df(spark: SparkSession, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(build_kb(seed))


def rel2desc_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(rel2desc_pdf())


# --------------------------------------------------------------------------
# Flat text corpus for operator benchmarks (bench.py text sections).
#
# The driver's documents.parquet is 5,000 short rows whose walls are
# fixed-cost dominated and whose uniform shape degenerates the curation
# gates (every doc fails the Gopher stopword rule → keep-rate 0, the r5
# verdict item).  This corpus is the non-degenerate stand-in: realistic
# length spread (lognormal, median ≈150 words), Zipf content vocabulary
# (real df/tf-idf tails for BM25/TF-IDF/LM/MinHash), Gopher stopwords in
# normal prose (keep-rate ≈60-80% with every failure mode represented:
# too-short, bullet-heavy, ellipsis/symbol-heavy, stopword-free token
# soup), boilerplate paragraphs shared across docs (exact dup-passage and
# MinHash signal), occasional PII strings (redaction work), and a 4-way
# lang split (en/de/fr/es with disjoint content prefixes, so lang-sliced
# ops — stratified sampling, DSIR's en target — see real strata).
#
# Pure function of (seed, doc_id), distributed via mapInPandas — the same
# contract as synth_documents: no driver materialization, any scale.
# --------------------------------------------------------------------------

TEXT_CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

_TC_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]
_TC_FILL = ["a", "in", "is", "it", "for", "on", "as", "at", "by", "an"]
_TC_LANGS = ["en", "de", "fr", "es"]
_TC_LANG_P = [0.80, 0.08, 0.07, 0.05]


def _tc_boilerplate(i: int) -> str:
    """One of 16 fixed ~30-word boilerplate paragraphs (cookie banners /
    footers) — the exact-duplicate-passage population."""
    return (
        f"this site number {i:02d} uses cookies to improve the experience "
        "and that choice can be changed at any time in the settings page . "
        "terms of service and the privacy policy apply to all visitors ."
    )


def _tc_sentence(rng: "np.random.RandomState", lang: str, vocab_size: int) -> str:
    n = int(rng.randint(6, 18))
    words = []
    for _ in range(n):
        r = rng.random_sample()
        if lang == "en" and r < 0.35:
            words.append(_TC_STOP[rng.randint(len(_TC_STOP))])
        elif r < 0.50:
            words.append(_TC_FILL[rng.randint(len(_TC_FILL))])
        else:
            # Zipf-tailed content vocabulary: realistic df distribution
            z = min(int(rng.zipf(1.4)), vocab_size)
            words.append(f"{lang}term{z:05d}")
    return " ".join(words) + " ."


def _tc_one_doc(seed: int, did: int, vocab_size: int) -> tuple[str, str]:
    rng = np.random.RandomState((seed * 1_000_003 + did) % (2**31 - 1))
    lang = _TC_LANGS[
        int(np.searchsorted(np.cumsum(_TC_LANG_P), rng.random_sample() + 1e-12))
    ]
    kind = rng.random_sample()
    if kind < 0.05:  # too short: fails the 50-word rule
        return _tc_sentence(rng, lang, vocab_size), lang
    if kind < 0.09:  # bullet-heavy listing: fails the bullet-line rule
        lines = [
            f"- {_tc_sentence(rng, lang, vocab_size)}" for _ in range(rng.randint(12, 30))
        ]
        return "\n".join(lines), lang
    if kind < 0.12:  # symbol/ellipsis spam: fails symbol + ellipsis rules
        parts = [
            f"## {_tc_sentence(rng, lang, vocab_size)} ..."
            for _ in range(rng.randint(8, 20))
        ]
        return "\n".join(parts), lang
    if kind < 0.15:  # stopword-free id soup: fails stopword + alpha rules
        toks = [f"{rng.randint(10**8):08d}" for _ in range(rng.randint(60, 200))]
        return " ".join(toks), lang
    if kind < 0.20:  # duplicate-cluster member: one of 32 canonical pages,
        # lightly suffixed — MinHash/SimHash near-dup population
        canon = np.random.RandomState(seed * 7 + int(rng.randint(32)))
        body = " ".join(_tc_sentence(canon, "en", vocab_size) for _ in range(12))
        return body + f" page variant {rng.randint(4)} .", "en"
    # normal prose document
    n_sents = max(4, int(rng.lognormal(2.3, 0.7)))
    sents = [_tc_sentence(rng, lang, vocab_size) for _ in range(n_sents)]
    if rng.random_sample() < 0.25:  # shared boilerplate → dup passages
        sents.insert(
            int(rng.randint(len(sents))), _tc_boilerplate(int(rng.randint(16)))
        )
    if rng.random_sample() < 0.10:  # PII for the redaction gate
        sents.append(
            f"contact user{rng.randint(999):03d}@example.com or 555-{rng.randint(100,999)}-{rng.randint(1000,9999)} ."
        )
    return "\n".join(
        " ".join(sents[i : i + 3]) for i in range(0, len(sents), 3)
    ), lang


def synth_text_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 7,
    partitions: int | None = None,
    vocab_size: int = 30_000,
) -> DataFrame:
    """Flat bench corpus: (doc_id bigint, text, lang, source, n_chars) —
    the driver documents.parquet schema at realistic web-crawl shape."""
    base = spark.range(
        0, n_docs, numPartitions=partitions or max(8, n_docs // 50_000)
    )

    def gen(batches):
        for pdf in batches:
            out = []
            for did in pdf["id"]:
                text, lang = _tc_one_doc(seed, int(did), vocab_size)
                out.append(
                    (int(did), text, lang, f"crawl{int(did) % 20:02d}", len(text))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    return base.mapInPandas(gen, schema=TEXT_CORPUS_SCHEMA)
