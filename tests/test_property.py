"""Property-based tests (hypothesis): the GD kernel and the OPH MinHash
kernel under adversarial inputs — no Spark session needed (pure numpy),
so these run in milliseconds and explore corners the fixture corpora
never hit."""

import numpy as np
from hypothesis import given, settings, strategies as st

from rust_gd_spark.gd import make_gd
from rust_gd_spark.operators import minhash as mh


@settings(max_examples=25, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=4096),
    k=st.sampled_from([120, 124, 126]),
)
def test_gd_rs_roundtrip_any_bytes(data, k):
    """dup(dedup(x)) == x for arbitrary byte strings under RS codes —
    the reference's core contract (`src/lib.rs:104-135`), fuzzed."""
    enc = make_gd("rs", 255, n=128, k=k)
    dec = make_gd("rs", 255, n=128, k=k)
    assert bytes(dec.dup(enc.dedup(data))) == data


@settings(max_examples=15, deadline=None)
@given(data=st.binary(min_size=0, max_size=2048), deg=st.sampled_from([4, 8]))
def test_gd_hamming_roundtrip_any_bytes(data, deg):
    enc = make_gd("hamming", 511, deg=deg)
    dec = make_gd("hamming", 511, deg=deg)
    assert bytes(dec.dup(enc.dedup(data))) == data


@settings(max_examples=50, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_oph_chunk_invariants(lens, seed):
    """Densified OPH signatures: fully densified (< 2^61), deterministic,
    permutation-of-rows equivariant, and equal inputs give equal rows."""
    rng = np.random.default_rng(seed)
    lens = np.asarray(lens, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    flat = rng.integers(0, 1 << 63, size=int(lens.sum()), dtype=np.uint64)
    sig = mh._oph_signatures_chunk(flat, starts, 128)
    assert sig.shape == (len(lens), 128)
    assert (sig <= np.uint64((1 << 61) - 1)).all()
    assert np.array_equal(sig, mh._oph_signatures_chunk(flat, starts, 128))
    # duplicate the first row's shingles as a new last row -> equal sigs
    flat2 = np.concatenate([flat, flat[starts[0] : starts[0] + lens[0]]])
    starts2 = np.append(starts, len(flat))
    sig2 = mh._oph_signatures_chunk(flat2, starts2, 128)
    assert np.array_equal(sig2[0], sig2[-1])
    assert np.array_equal(sig2[: len(lens)], sig)


@settings(max_examples=30, deadline=None)
@given(
    shared=st.integers(min_value=0, max_value=200),
    extra_a=st.integers(min_value=0, max_value=200),
    extra_b=st.integers(min_value=0, max_value=200),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_oph_estimator_tracks_jaccard(shared, extra_a, extra_b, seed):
    """Slot agreement ≈ Jaccard within a coarse statistical envelope
    (k=128 slots ⇒ sd ≈ sqrt(J(1-J)/128) ≤ 0.045; allow 5 sd + the
    densification small-set bias)."""
    if shared + extra_a == 0 or shared + extra_b == 0:
        return
    rng = np.random.default_rng(seed)
    pool = rng.integers(0, 1 << 63, size=shared + extra_a + extra_b, dtype=np.uint64)
    a = pool[: shared + extra_a]
    b = np.concatenate([pool[:shared], pool[shared + extra_a :]])
    flat = np.concatenate([a, b])
    starts = np.array([0, len(a)], dtype=np.int64)
    sig = mh._oph_signatures_chunk(flat, starts, 128)
    est = float((sig[0] == sig[1]).mean())
    true_j = shared / (shared + extra_a + extra_b)
    assert abs(est - true_j) <= 0.25, (est, true_j)
