"""Text/entity normalization + text-analysis column expressions.

All pure Column expressions (JVM-side, codegen'd) — no Python UDFs.

Reference semantics re-expressed:
  * underscore/space normalization — filter_tuples.py:37, ptuningfilter.py:53-54
  * parenthetical qualifier stripping (del_bar) — ptuning.py:88-106
plus the training-data text-analysis surface (lang-id heuristic, quality
scoring, token counting, fingerprinting) required for large-scale corpus
work (SURVEY.md §5, driver spec).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- entity forms


def norm_space(col: Column | str) -> Column:
    """Underscore form → space form: ``David_Beckham`` → ``David Beckham``."""
    return F.translate(F.col(col) if isinstance(col, str) else col, "_", " ")


def norm_underscore(col: Column | str) -> Column:
    """Space form → underscore form (inverse of :func:`norm_space`)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, " ", "_")


def strip_parenthetical(col: Column | str, max_depth: int = 3) -> Column:
    """Remove ``( ... )`` qualifier spans, innermost-out, up to ``max_depth``
    nesting levels (the reference's recursive ``del_bar``, ptuning.py:88-106).

    Iterated regexp_replace stays JVM-side; real-world qualifiers nest ≤2.
    Also collapses doubled separators left behind (``a__b`` → ``a_b``) and
    trims stray edge separators.

    Fast path: the ``max_depth`` iterated paren regexes are no-ops on a
    string without ``(``, so they are gated behind a cheap ``contains`` —
    only qualifier-bearing rows (a small minority of real entity surface
    forms) pay the full chain.  Semantics are bit-identical either way
    (the separator cleanup always applies), pinned by the python-twin
    parity + hypothesis idempotence tests.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = c
    for _ in range(max_depth):
        stripped = F.regexp_replace(stripped, r"\([^()]*\)", "")
    body = F.when(c.contains("("), stripped).otherwise(c)
    body = F.regexp_replace(body, r"__+", "_")
    body = F.regexp_replace(body, r"  +", " ")
    return F.regexp_replace(body, r"^[_ ]+|[_ ]+$", "")


def canonical_entity(col: Column | str) -> Column:
    """Canonical surface form: strip qualifiers, normalize to underscore form.

    This is the deterministic alias-normalization step that feeds
    connected-components alias clustering (SURVEY.md §7 step 7).

    Fast path: a surface form with no ``(``, no ADJACENT separator pair
    (``__``, two spaces, or mixed ``_ ``/`` _`` — after norm_space all
    become doubled spaces the cleanup would collapse) and no edge
    separator canonicalizes to plain ``norm_underscore`` — one translate
    instead of ~7 regex evaluations.  Real entity names overwhelmingly
    take this branch; this projection runs once per media span over the
    whole corpus, so it is one of the engine's hottest scalar
    expressions (≈40 s/core per 6M media rows before gating).
    Bit-identical semantics pinned by the python-twin parity tests
    (which include the mixed-separator adversarial cases) and the
    hypothesis idempotence/separator-invariance properties.
    """
    c = F.col(col) if isinstance(col, str) else col
    dirty = c.contains("(") | c.rlike(r"[_ ]{2}|^[_ ]|[_ ]$")
    return F.when(
        dirty, norm_underscore(strip_parenthetical(norm_space(c)))
    ).otherwise(norm_underscore(c))


# ------------------------------------------------------------- text analysis

_STOPWORDS = (
    "the,a,an,of,to,in,and,is,was,for,on,with,as,by,at,from,that,this,it,are,"
    "be,or,his,her,their,its"
)


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    )


def lang_id(col: Column | str) -> Column:
    """Cheap n-gram/stopword language heuristic → 'en' | 'other'.

    Counts how many of the top English function words appear; ≥2 hits → en.
    A real deployment swaps in a fastText/cld3 pandas UDF — the column
    contract (string in, label out) is identical.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    words = F.split(c, r"[^a-z]+")
    stop_arr = F.split(F.lit(_STOPWORDS), ",")
    hits = F.size(F.array_intersect(words, stop_arr))
    return F.when(hits >= 2, F.lit("en")).otherwise(F.lit("other"))


def quality_score(col: Column | str, round_to: int | None = 6) -> Column:
    """Heuristic document quality in [0,1]: blend of length, alpha ratio,
    punctuation ratio and stopword ratio — the standard pretraining-corpus
    quality gates, as one pure-Column expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^!?.,;:]", "")).cast("double")
    toks = token_count(c).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(punct / n * 10.0, F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    tok_score = F.when(toks > 0, F.least(toks / F.lit(100.0), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    raw = (
        0.4 * len_score
        + 0.3 * alpha_ratio
        + 0.2 * tok_score
        + 0.1 * (1.0 - punct_penalty)
    )
    return F.round(raw, round_to) if round_to is not None else raw


_PII_PATTERNS = [
    # ordered: emails before phones so the local-part digits of an address
    # are never half-eaten by the phone pattern.  Every pattern is written
    # to mean the same thing under Java regex (Spark, backtracking) and
    # RE2 (DuckDB, leftmost-longest): greedy character classes only, no
    # ambiguous alternation.
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace emails, IPv4 addresses and phone-shaped digit runs with
    typed placeholders — the standard pretraining-corpus PII scrub
    (applied before any text ships to training or is logged).

    Pure chained ``regexp_replace`` — JVM-side, codegen'd, no Python in
    the hot path; at 100 TB this is a map-only pass that fuses into the
    scan.  The pattern set is deliberately conservative (high precision):
    a real deployment layers a learned NER pass behind the same column
    contract for recall.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, tag in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def repetition_ratio(col: Column | str, sep: str = "\x1f") -> Column:
    """Fraction of duplicated token bigrams in the document, in [0, 1] —
    the Gopher-style repetition quality gate (highly repetitive documents
    are boilerplate/spam and get filtered or down-weighted).

    ratio = 1 − |distinct bigrams| / |bigrams|; 0 for documents with < 2
    tokens.  Pure array Column algebra over the whitespace tokens (split →
    zip_with over two shifted slices → array_distinct) — no explode, no
    shuffle: the whole signal computes inside the scan projection.

    Construction note: higher-order-function lambdas evaluate INTERPRETED
    per element, so the lambda body must stay minimal.  Building bigrams
    as ``zip_with(slice(t,1,n-1), slice(t,2,n-1), concat)`` is 6.5×
    faster than an indexed ``transform`` whose lambda does
    ``try_element_at(t, i+2)`` (per-element array indexing + ANSI branch)
    — measured 6.3 s → 0.97 s over 100k documents at 32 cores, identical
    output.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    toks = F.split(c, r"\s+")
    n_t = F.size(toks)
    tail_len = F.greatest(n_t - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, tail_len),
        F.slice(toks, 2, tail_len),
        lambda x, y: F.concat_ws(sep, x, y),
    )
    n_g = F.size(grams).cast("double")
    return F.when(
        (F.length(c) == 0) | (n_t < 2), F.lit(0.0)
    ).otherwise(F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n_g)


def blank_text(col: Column | str) -> Column:
    """THE corpus-wide blank predicate: true iff nothing survives the
    tokenizer contract's whitespace collapse (collapse-THEN-trim — Spark
    trim alone strips only ASCII spaces, so a tab/newline-only doc must
    still count as blank).  One definition shared by gopher_rules and
    chunk_documents so the gates can't drift from the tokenizer.

    Portability note (same caveat as ``normalized_tokens`` and every
    tokenizer oracle): the collapse uses ``\\s+``, which Java regex reads
    as including \\x0B (vertical tab) while RE2/DuckDB does not — the
    corpus contract is standard whitespace (space/tab/newline/CR/FF),
    like the BMP-text contract of token_count_bpe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.trim(F.regexp_replace(c, r"\s+", " "))) == 0


def normalized_tokens(col: Column | str) -> Column:
    """THE corpus-wide tokenizer contract: collapse whitespace → trim →
    lower → split on single spaces.  One definition shared by the dedup
    gram/shingle builders, the rolling fingerprint and the LM scorer (and
    mirrored by every DuckDB oracle) — the collapse-THEN-trim order is
    load-bearing: Spark trim strips only ASCII spaces, so trimming first
    would leave edge tabs/newlines as empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))), " ")


def doc_fingerprint(col: Column | str) -> Column:
    """64-bit content fingerprint of normalized text (whitespace-collapsed,
    lowercased) — the exact-dedup key. xxhash64 is stable across runs."""
    c = F.col(col) if isinstance(col, str) else col
    normed = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.xxhash64(normed)


# BPE-ish pre-tokenizer: letter runs | single digits | single symbols — the
# GPT-2-style split shape (digits one-per-token).  Whitespace is spelled as
# an explicit char class (NOT \s) because Java regex counts \x0B as \s and
# RE2 does not — with the explicit class both engines agree on every char.
_BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\r\f\x0B]"


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: letter runs, per-digit numbers, and single
    punctuation/symbol chars each count as one token (the shape a GPT-style
    pre-tokenizer produces, without shipping a vocab).  Pure JVM regex —
    fuses into the scan projection.  Non-BMP chars (outside UTF-16's basic
    plane) may count differently than an RE2 oracle; the corpus contract
    here is BMP text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_TOKEN_PATTERN), F.lit(0)))


def rolling_fingerprint(col: Column | str, base: int = 131) -> Column:
    """Polynomial rolling hash (Rabin–Karp) of the normalized token stream:
    h ← (h·base + tokenhash) mod (2³¹−1), folded left-to-right — the
    order-SENSITIVE counterpart of ``doc_fingerprint`` (xxhash of the
    joined string): prefix-composable, so a chunked scanner can extend a
    stored prefix hash without re-reading the document.  Token hash is the
    28-bit md5 hex prefix (engine-portable); the fold stays < 2³⁸ so ANSI
    bigint arithmetic can never overflow.  Blank text → 0.

    Normalization is collapse-THEN-trim (the same order as doc_fingerprint
    and the gram tokenizers): Spark's trim strips only ASCII spaces, so
    trimming first would leave edge tabs/newlines to become empty tokens
    and diverge from the regex-normalized oracle."""
    raw = F.col(col) if isinstance(col, str) else col
    c = F.trim(F.regexp_replace(raw, r"\s+", " "))
    toks = normalized_tokens(raw)
    hashed = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint")
    )
    folded = F.aggregate(
        hashed,
        F.lit(0).cast("bigint"),
        lambda h, t: (h * F.lit(base) + t) % F.lit(2147483647),
    )
    return F.when(F.length(c) == 0, F.lit(0).cast("bigint")).otherwise(folded)


# Gopher rule-set stopwords (Rae et al. 2021, §A1.1: "the, be, to, of, and,
# that, have, with" — a document must contain at least two of them).
_GOPHER_STOPWORDS = "the,be,to,of,and,that,have,with"


def gopher_rules(col: Column | str) -> Column:
    """Gopher-style rule-based quality gate (Rae et al. 2021 §A1.1; the
    same rule family C4/Dolma/FineWeb use): seven boolean rules plus their
    conjunction, as ONE struct-typed pure-Column expression.

    Rules (each True = the document passes that gate):
      * word_count      — 50 ≤ words ≤ 100,000
      * mean_word_len   — mean token length in [3, 10]
      * symbol_ratio    — (#'#' + #'...' + #'…') / words ≤ 0.1
      * bullet_lines    — ≤ 90% of lines start with a bullet (-, *, •)
      * ellipsis_lines  — ≤ 30% of lines end with '...' or '…'
      * alpha_words     — ≥ 80% of tokens contain a letter
      * stopwords       — ≥ 2 distinct Gopher stopwords present
    plus ``keep`` = AND of all seven, and ``n_words`` for diagnostics.

    Everything is array/regex Column algebra over ``normalized_tokens``
    (the corpus tokenizer contract) — no explode, no shuffle, no Python:
    at 100 TB this is a map-only projection that fuses into the scan,
    like ``quality_score``/``repetition_ratio``.  The filter-lambda
    bodies are single rlike/length calls (HOF lambdas evaluate
    interpreted per element — keep them minimal).  Blank documents fail
    every ratio rule explicitly (no 0/0).

    The reference's corpus arrives pre-curated (its quality gates are
    model thresholds, ptuningfilter.py:33-47); this is the engine
    extension a from-crawl corpus needs upstream of those gates.
    """
    raw = F.col(col) if isinstance(col, str) else col
    blank = blank_text(raw)  # the shared tokenizer-contract predicate
    toks = normalized_tokens(raw)
    n_w = F.when(blank, F.lit(0)).otherwise(F.size(toks)).cast("bigint")
    nw_d = n_w.cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
    )
    mean_len = F.when(n_w > 0, sum_len.cast("double") / nw_d).otherwise(F.lit(0.0))
    n_sym = F.size(
        F.regexp_extract_all(raw, F.lit(r"#|\.\.\.|…"), F.lit(0))
    ).cast("double")
    lines = F.split(raw, "\n")
    n_l = F.size(lines).cast("double")  # split() is never empty: n_l >= 1
    # explicit [ \t] indent/trail classes: F.ltrim/F.rtrim strip ASCII
    # spaces only (tab-indented bullets would evade the gate), and \s in
    # a Java regex counts \x0B where RE2 does not — the explicit class is
    # the engine-portable spelling
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^[ \t]*[-*•]"))
    ).cast("double")
    n_ell = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)[ \t]*$"))
    ).cast("double")
    n_alpha = F.when(blank, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    ).cast("double")
    stop_hits = F.size(
        F.array_intersect(toks, F.split(F.lit(_GOPHER_STOPWORDS), ","))
    )
    r_words = (n_w >= 50) & (n_w <= 100000)
    r_mean = (mean_len >= 3.0) & (mean_len <= 10.0)
    r_sym = F.when(n_w > 0, n_sym / nw_d <= 0.1).otherwise(F.lit(False))
    r_bullet = n_bullet / n_l <= 0.9
    r_ell = n_ell / n_l <= 0.3
    r_alpha = F.when(n_w > 0, n_alpha / nw_d >= 0.8).otherwise(F.lit(False))
    r_stop = stop_hits >= 2
    rules = [r_words, r_mean, r_sym, r_bullet, r_ell, r_alpha, r_stop]
    keep = rules[0]
    n_rules = rules[0].cast("int")
    for r in rules[1:]:
        keep = keep & r
        n_rules = n_rules + r.cast("int")
    return F.struct(
        n_w.alias("n_words"),
        r_words.alias("r_word_count"),
        r_mean.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_bullet.alias("r_bullet_lines"),
        r_ell.alias("r_ellipsis_lines"),
        r_alpha.alias("r_alpha_words"),
        r_stop.alias("r_stopwords"),
        n_rules.alias("n_rules"),
        keep.alias("keep"),
    )


def split_sentences(col: Column | str) -> Column:
    """array<string> of trimmed, non-empty sentences: the text is split
    after sentence-final punctuation ([.!?]) followed by a space.

    Implemented as substitute-then-split (insert \\x1e after the
    punctuation, split on it) because the natural lookbehind split
    ``(?<=[.!?]) `` is Java-regex-only — RE2/DuckDB reject lookarounds,
    and the repo's portability contract (CLAUDE.md) is
    greedy-classes-plus-backreferences that both engines implement
    identically.  Map-only column expression — fuses into the scan.
    Abbreviation dots ("e.g. x") split like any sentence end: this is the
    cheap length/segment-stats splitter of a corpus pipeline, not an NLP
    segmenter, and the contract is byte-deterministic over BMP text."""
    c = F.col(col) if isinstance(col, str) else col
    marked = F.regexp_replace(c, r"([.!?]) ", "$1\x1e")
    return F.filter(
        F.transform(F.split(marked, "\x1e"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def portable_fingerprint(col: Column | str) -> Column:
    """60-bit md5 content fingerprint of normalized text — the
    engine-portable twin of ``doc_fingerprint`` (xxhash64): DuckDB computes
    the identical value as ``('0x' || substr(md5(lower(trim(
    regexp_replace(text,'\\s+',' ','g')))), 1, 15))::BIGINT``.  Use in
    oracle-facing dedup stats; production dedup keeps xxhash64."""
    c = F.col(col) if isinstance(col, str) else col
    normed = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.conv(F.substring(F.md5(normed), 1, 15), 16, 10).cast("bigint")
