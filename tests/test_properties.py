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
