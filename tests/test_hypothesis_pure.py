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


@given(
    st.lists(
        st.floats(min_value=0.0, max_value=255.999, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=300, deadline=None)
def test_floor_half_up_equals_decimal_half_up(xs):
    """The Arrow twins' ``floor(x + 0.5)`` must BE round-half-up for every
    double in [0, 256) — the exactness claim their parity rests on (0.5 is
    an exact multiple of every ulp in that range, so x + 0.5 never rounds)."""
    import decimal
    import math

    for x in xs:
        got = math.floor(x + 0.5)
        want = int(
            decimal.Decimal(repr(x)).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )
        assert got == want, x


@given(
    st.lists(
        st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False, width=32), min_size=64, max_size=64),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_pq_lut_distance_identity(vectors):
    """pq_adc_lut + codes must reproduce the directly-computed subspace
    distances: for any vector encoded against a codebook drawn from the
    same set, ADC(codes) == sum_j ||v_j_codeword - q_j||² exactly (table
    lookup is exact by construction — the approximation is ONLY in the
    codeword snap)."""
    from vectordb_hr_data_spark.operators.pq import pq_adc_lut

    cb = vectors[: min(len(vectors), 16)]
    q = vectors[-1]
    lut = pq_adc_lut(cb, q, dim=64, m=8)
    # pick each subspace's codeword 0 → ADC must equal the LUT row sums
    total = 0.0
    for j in range(8):
        total = total + lut[j][0]
    direct = 0.0
    for j in range(8):
        acc = 0.0
        for t in range(8):
            d = q[j * 8 + t] - cb[0][j * 8 + t]
            acc = acc + d * d
        direct = direct + acc
    assert total == direct


@given(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=64, max_size=64),
    st.floats(min_value=0.001, max_value=1000.0),
)
@settings(max_examples=50, deadline=None)
def test_bitsketch_signature_scale_invariant(vec, scale):
    """Sign bits depend only on direction: sig(c·v) == sig(v) for any
    c > 0 — the property that makes the sketch an ANGULAR estimator
    (Charikar '02), robust to norm drift that breaks L2 sketches."""
    from vectordb_hr_data_spark.operators.bitsketch import signature_half_driver
    from vectordb_hr_data_spark.operators.opq import rotate_fold_driver, seeded_rotation

    rot = seeded_rotation(64, seed=7)
    r1 = rotate_fold_driver(vec, rot)
    r2 = rotate_fold_driver([x * scale for x in vec], rot)
    for h in (0, 1):
        assert signature_half_driver(r1, h) == signature_half_driver(r2, h)


@given(
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=64, max_size=64),
    st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=64, max_size=64),
)
@settings(max_examples=50, deadline=None)
def test_bitsketch_hamming_symmetric_bounded(a, b):
    """Driver-side Hamming between two signatures is symmetric, zero on
    self, and bounded by the bit width."""
    from vectordb_hr_data_spark.operators.bitsketch import signature_half_driver
    from vectordb_hr_data_spark.operators.opq import rotate_fold_driver, seeded_rotation

    rot = seeded_rotation(64, seed=7)
    ra, rb = rotate_fold_driver(a, rot), rotate_fold_driver(b, rot)

    def sig(r):
        return signature_half_driver(r, 0) | (signature_half_driver(r, 1) << 32)

    d_ab = bin(sig(ra) ^ sig(rb)).count("1")
    d_ba = bin(sig(rb) ^ sig(ra)).count("1")
    assert d_ab == d_ba
    assert 0 <= d_ab <= 64
    assert bin(sig(ra) ^ sig(ra)).count("1") == 0


@given(
    st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False), min_size=32, max_size=32)
)
@settings(max_examples=50, deadline=None)
def test_rotation_fold_linear(vec):
    """The left-fold rotation is linear: fold(v + w) folds to the same
    doubles as fold(v) + fold(w) need NOT hold bitwise (different add
    orders), but fold(0) == 0 and fold(-v) == -fold(v) DO hold exactly
    (negation is exact in IEEE)."""
    from vectordb_hr_data_spark.operators.opq import rotate_fold_driver, seeded_rotation

    rot = seeded_rotation(32, seed=11)
    assert rotate_fold_driver([0.0] * 32, rot) == [0.0] * 32
    pos = rotate_fold_driver(vec, rot)
    neg = rotate_fold_driver([-x for x in vec], rot)
    assert all(p == -n for p, n in zip(pos, neg))
