"""Hypothesis property tests for the pure text/scoring functions.

Strategy note: Spark round-trips are too slow per example, so properties
run on the PYTHON twins (canonical_entity_py, xxh64) that other tests pin
bit-for-bit against the Column implementations — the chain
property→python-twin→Spark-parity gives the Column functions property
coverage at pandas speed.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from imgfact_spark.functions.scoring import _MOD, xxh64
from tests.oracle import canonical_entity_py

entity_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" _()"),
    min_size=0,
    max_size=60,
)


@given(entity_text)
@settings(max_examples=300, deadline=None)
def test_canonical_entity_idempotent(s):
    once = canonical_entity_py(s)
    assert canonical_entity_py(once) == once


@given(entity_text)
@settings(max_examples=300, deadline=None)
def test_canonical_entity_separator_invariant(s):
    assert canonical_entity_py(s.replace(" ", "_")) == canonical_entity_py(s)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_xxh64_stable_and_bounded(b):
    h1, h2 = xxh64(b), xxh64(b)
    assert h1 == h2
    assert 0 <= h1 < 2**64
    u = (h1 % _MOD) / _MOD
    assert 0.0 <= u < 1.0


@given(st.text(min_size=0, max_size=100))
@settings(max_examples=200, deadline=None)
def test_xxh64_utf8_no_crash(s):
    xxh64(s.encode("utf-8"))


# --------------------------------------------------------------- round 2


sessions_events = st.lists(
    st.tuples(st.integers(0, 20_000), st.integers(0, 3)),  # (epoch_s, user)
    min_size=0, max_size=60,
)


def _brute_sessions(events, gap):
    """Independent oracle: per user, sort times, split on gap."""
    out = set()
    by_user: dict[int, list[int]] = {}
    for t, u in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start = prev = ts[0]
        n = 0
        for t in ts:
            if t - prev > gap:
                out.add((u, start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        out.add((u, start, prev, n))
    return out


@given(sessions_events, st.integers(1, 5_000))
@settings(max_examples=60, deadline=None)
def test_gaps_and_islands_python_twin(events, gap):
    """Property for the sessionization SEMANTICS via the brute oracle:
    sessions partition each user's events; boundaries respect the gap.
    (The Spark implementation is pinned to hand-computed sessions and the
    stream twin in test_streaming; this covers the algorithm space.)"""
    sessions = _brute_sessions(events, gap)
    per_user_counts: dict[int, int] = {}
    for u, start, end, n in sessions:
        assert start <= end
        per_user_counts[u] = per_user_counts.get(u, 0) + n
    for u in {e[1] for e in events}:
        assert per_user_counts[u] == sum(1 for e in events if e[1] == u)
    # no two sessions of one user overlap or violate the gap
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, start, end, n in sessions:
        by_user.setdefault(u, []).append((start, end))
    for u, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 - e1 > gap


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_quantize_python_twin_bounds_and_monotone(xs):
    """int8-style quantization (floor(x*127/maxabs)): codes bounded in
    [-128, 127] and monotone in x.  (The extreme code may be 126 when the
    float division lands just under 127 — bounds, not exact endpoints, are
    the contract.)"""
    import math

    maxabs = max(abs(x) for x in xs)
    if maxabs == 0:
        qs = [0] * len(xs)
    else:
        qs = [math.floor(x * 127 / maxabs) for x in xs]
    assert all(-128 <= q <= 127 for q in qs)
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    for a, b in zip(order, order[1:]):
        assert qs[a] <= qs[b]




# --------------------------------------------------------------- round 4

pii_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd"),
        whitelist_characters=" .@+-()_%",
    ),
    min_size=0,
    max_size=120,
)


@given(pii_text)
@settings(max_examples=300, deadline=None)
def test_redact_pii_idempotent(s):
    """A scrub pass must be safe to re-run: placeholders contain no
    pattern-matchable characters, so redact∘redact == redact."""
    from tests.oracle import redact_pii_py

    once = redact_pii_py(s)
    assert redact_pii_py(once) == once


@given(pii_text)
@settings(max_examples=300, deadline=None)
def test_redact_pii_removes_all_emails_and_ips(s):
    """Post-scrub text never contains an email or IPv4 match."""
    import re

    from imgfact_spark.functions.text import _PII_PATTERNS
    from tests.oracle import redact_pii_py

    out = redact_pii_py(s)
    for pat, _ in _PII_PATTERNS[:2]:  # email, ip — exact full-pattern classes
        assert not re.search(pat, out), (s, out, pat)
