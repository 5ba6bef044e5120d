"""BasisDict LRU semantics tests (parity with /root/reference/src/dict.rs)."""

import pytest

from rust_gd_spark.gd.basis_dict import BasisDict

# the reference's dict test corpus (`src/dict.rs:146-147`)
WORD_STR = (
    "寿限無(じゅげむ)寿限無(じゅげむ)五劫(ごこう)のすりきれ"
    "海砂利(かいじゃり)水魚(すいぎょ)の水行末(すいぎょうまつ) "
)


def test_id_bitlen():
    # id_bitlen = bit_length(dict_size)  (dict.rs:24)
    assert BasisDict(511).id_bitlen == 9
    assert BasisDict(512).id_bitlen == 10
    assert BasisDict(15).id_bitlen == 4
    assert BasisDict(1).id_bitlen == 1


def test_sequential_id_assignment():
    d = BasisDict(4)
    assert d.put_base(b"a") == 0
    assert d.put_base(b"b") == 1
    assert d.put_base(b"c") == 2
    assert d.get_id(b"a") == 0
    assert d.get_id(b"zz") is None


def test_lru_eviction_reuses_freed_id():
    d = BasisDict(2)
    assert d.put_base(b"a") == 0
    assert d.put_base(b"b") == 1
    # touch "a" so "b" becomes LRU
    assert d.get_id(b"a") == 0
    assert d.put_base(b"c") == 1  # evicts b, reuses id 1
    assert d.get_id(b"b") is None
    assert d.get_id(b"a") == 0
    assert d.get_id(b"c") == 1
    d.check_inner_integrity()


def test_get_base_refreshes_recency():
    d = BasisDict(2)
    d.put_base(b"a")
    d.put_base(b"b")
    d.get_base(0)  # touches "a" -> "b" is now LRU
    assert d.put_base(b"c") == 1
    assert d.get_base(1) == b"c"
    with pytest.raises(KeyError):
        d.get_base(7)


def test_dual_dict_equivalence():
    """Mirror of dict.rs:152-182: two dicts fed the same stream of bases
    assign identical ids, and stay internally consistent."""
    word_bytes = (WORD_STR * 128).encode("utf-8")
    msg_bytelen, code_bytelen, dict_size = 3, 4, 10
    d1, d2 = BasisDict(dict_size), BasisDict(dict_size)
    ptr = 0
    while ptr + msg_bytelen <= len(word_bytes):
        buf = word_bytes[ptr : ptr + msg_bytelen]
        hit = d1.get_id(buf)
        if hit is not None:
            assert d2.get_base(hit) == buf
        else:
            assert d1.put_base(buf) == d2.put_base(buf)
        d1.check_inner_integrity()
        d2.check_inner_integrity()
        ptr += code_bytelen
