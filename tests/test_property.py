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


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    ),
    w=st.sampled_from([1, 2, 3]),
)
def test_counted_shingles_match_counter_reference(texts, w):
    """The counted kernel's (values, counts) must equal a Counter over
    the string w-grams of the NORMALIZED text, and the bag-Jaccard
    identities must hold: J_bag(x, x) = 1 and J_bag <= J_set pairwise."""
    import re
    from collections import Counter

    from rust_gd_spark.operators.minhash import _shingle_hash_batch

    def norm(t):
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    def grams(t):
        toks = [x for x in norm(t).split(" ") if x] if norm(t) else []
        if len(toks) < w:
            return Counter([" ".join(toks)])
        return Counter(
            " ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)
        )

    normed = [norm(t) for t in texts]
    out = _shingle_hash_batch(normed, w, counted=True)
    setout = _shingle_hash_batch(normed, w)
    for t, (vals, cnts), sv in zip(texts, out, setout):
        ref = grams(t)
        # multiset cardinalities match the string-gram reference
        assert sorted(cnts.tolist()) == sorted(ref.values())
        assert int(cnts.sum()) == sum(ref.values())
        # distinct values agree with the set kernel (same hashes)
        assert vals.tolist() == sv.tolist()
        # values ascend as uint64 (the verify kernel's merge invariant)
        u = vals.view("uint64") if hasattr(vals, "view") else vals
        assert all(u[i] < u[i + 1] for i in range(len(u) - 1))

    # pairwise: J_bag <= J_set, and J_bag(x, x) == 1
    def bag_set_j(i, j):
        vi, ci = out[i]
        vj, cj = out[j]
        di = dict(zip(vi.tolist(), ci.tolist()))
        dj = dict(zip(vj.tolist(), cj.tolist()))
        inter = set(di) & set(dj)
        m = sum(min(di[s], dj[s]) for s in inter)
        tot = sum(di.values()) + sum(dj.values())
        jb = m / (tot - m) if tot - m else 1.0
        js = len(inter) / len(set(di) | set(dj))
        return jb, js

    for i in range(len(out)):
        jb, js = bag_set_j(i, i)
        assert jb == 1.0 and js == 1.0
        for j in range(i + 1, len(out)):
            jb, js = bag_set_j(i, j)
            assert jb <= js + 1e-12
