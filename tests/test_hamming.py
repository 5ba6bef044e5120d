"""Hamming codec golden tests.

Vectors from the reference (`/root/reference/src/libecc/src/hamming/mod.rs:128-174`)
and its table-validation test (`hamming/mod.rs:176-202`).
"""

import numpy as np

from rust_gd_spark.gd.hamming import (
    PRIMITIVE_POLYNOMIALS,
    Hamming,
    build_syndrome_tables,
)


def bits(s: str) -> np.ndarray:
    return np.array([int(c) for c in s], dtype=np.uint8)


def tostr(a: np.ndarray) -> str:
    return "".join(str(int(x)) for x in a.reshape(-1))


def test_syndrome_tables_deg3_deg4_golden():
    # exact tables quoted in hamming/constant.rs
    p3, s3 = build_syndrome_tables(3)
    assert list(p3) == [0, 5, 7, 6, 3, 4, 2, 1]
    for syn, pos in [(5, 1), (7, 2), (1, 7), (0, 0)]:
        assert s3[syn] == pos
    p4, _ = build_syndrome_tables(4)
    assert list(p4) == [0, 9, 13, 15, 14, 7, 10, 5, 11, 12, 6, 3, 8, 4, 2, 1]


def test_deg3_decode_golden():
    h = Hamming(3)
    base, syn = h.decode(bits("0000000")[None, :])
    assert tostr(base) == "0000" and syn[0] == 0
    base, syn = h.decode(bits("1111111")[None, :])
    assert tostr(base) == "1111" and syn[0] == 0
    base, syn = h.decode(bits("1011110")[None, :])
    assert tostr(base) == "1001" and tostr(Hamming.syndrome_to_bits(syn, 3)) == "110"
    base, syn = h.decode(bits("1100111")[None, :])
    assert tostr(base) == "0100" and tostr(Hamming.syndrome_to_bits(syn, 3)) == "101"
    base, syn = h.decode(bits("0000101")[None, :])
    assert tostr(base) == "1000" and tostr(Hamming.syndrome_to_bits(syn, 3)) == "101"


def test_deg3_encode_golden():
    h = Hamming(3)
    assert tostr(h.encode(bits("1000")[None, :], np.array([0]))) == "1000101"
    dev = Hamming.bits_to_syndrome(bits("110")[None, :])
    assert tostr(h.encode(bits("1010")[None, :], dev)) == "1000011"
    dev = Hamming.bits_to_syndrome(bits("101")[None, :])
    assert tostr(h.encode(bits("1000")[None, :], dev)) == "0000101"


def test_roundtrip_all_degrees():
    rng = np.random.default_rng(42)
    for deg in PRIMITIVE_POLYNOMIALS:
        h = Hamming(deg)
        cw = rng.integers(0, 2, (64, h.code_bit_len)).astype(np.uint8)
        base, syn = h.decode(cw)
        back = h.encode(base, syn)
        assert np.array_equal(back, cw), f"deg {deg} round-trip failed"


def test_table_validation_residue():
    """Mirror of hamming/mod.rs:176-202: syndrome of single error at 1-indexed
    pos p equals residue of x^(n-p) mod primitive poly; tables are mutually
    inverse."""
    from rust_gd_spark.gd.hamming import _poly_mod

    for deg, poly in PRIMITIVE_POLYNOMIALS.items():
        n = (1 << deg) - 1
        p2s, s2p = build_syndrome_tables(deg)
        for pos in [0, 1, 2, n // 2, n - 1, n]:
            if pos == 0:
                assert p2s[0] == 0
                continue
            syn = _poly_mod(1 << (n - pos), poly)
            assert p2s[pos] == syn
            assert s2p[syn] == pos
