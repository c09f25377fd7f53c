"""Hypothesis property tests for the driver-side pure functions (fast —
no Spark job per example; the Spark-level invariants live in
tests/test_properties.py with seeded corpora)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_hr_data_spark.embed import _hash_vec
from vectordb_hr_data_spark.functions.text import parse_list_input, query_keywords
from vectordb_hr_data_spark.operators.knn import overfetch_count


@given(st.text(max_size=200), st.integers(min_value=1, max_value=128))
@settings(max_examples=200, deadline=None)
def test_hash_vec_deterministic_and_bounded(text, dim):
    a, b = _hash_vec(text, dim), _hash_vec(text, dim)
    assert a == b
    assert len(a) == dim
    assert all(-1.0 <= x <= 1.0 for x in a)


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=100))
@settings(max_examples=200, deadline=None)
def test_parse_list_input_never_blank(raw):
    out = parse_list_input(raw)
    assert all(p == p.strip() and p for p in out)
    # idempotent: re-parsing the joined output returns the same list (no
    # element of the output contains a comma by construction)
    assert parse_list_input(", ".join(out)) == out


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_query_keywords_contract(q):
    kws = query_keywords(q)
    # reference semantics (talent_recommender.py:108): >2 chars, lowered,
    # no surrounding whitespace
    assert all(len(k) > 2 and k == k.lower() and k == k.strip() for k in kws)
    for k in kws:
        assert k in q.lower()


@given(st.integers(min_value=1, max_value=1000))
def test_overfetch_width(k):
    w = overfetch_count(k)
    # reference: k*5 if k*5 > 10 else 20 → always ≥ max(k, 11-ish) and ≥ k
    assert w == (k * 5 if k * 5 > 10 else 20)
    assert w >= k
