"""GD end-to-end round-trip property tests.

Mirrors the reference's integration tests:
* Hamming deg 4..10, dict 511, Jugemu corpus (`/root/reference/src/lib.rs:107-138`)
* RS(128, 120..127) with random noise XOR'd into parity positions, dict
  2^((n-k)*2) capped at 255 (`src/lib.rs:140-195`)
* RS(4,3) + 4x4 error-alignment matrix (`src/lib.rs:197-239`)

The invariant under test is the reference's own: dup(dedup(x)) == x.
"""

import numpy as np
import pytest

from rust_gd_spark.gd import make_gd

# the reference test corpus (`src/lib.rs:104-105`)
WORD_STR = (
    "寿限無(じゅげむ)寿限無(じゅげむ)五劫(ごこう)のすりきれ"
    "海砂利(かいじゃり)padpadpadpadpadpadpadpad"
)


@pytest.mark.parametrize("deg", range(4, 11))
def test_hamming_roundtrip(deg):
    words = (WORD_STR * 128).encode("utf-8")
    gd_dedup = make_gd("hamming", 511, deg=deg)
    gd_dup = make_gd("hamming", 511, deg=deg)
    x = gd_dedup.dedup(words)
    y = gd_dup.dup(x)
    assert y == words
    # The reference prints (never asserts) the dedup rate: small degrees
    # expand (11-bit inline base per 8-bit chunk) and deg 10's 127-byte
    # chunks slide out of phase with the 128-byte corpus period, so only
    # deg 8 reliably compresses here — same arithmetic as the reference.
    if deg == 8:
        assert len(x.data) < len(words)


@pytest.mark.parametrize("msg_len", range(120, 128))
def test_rs_roundtrip_noise_in_parity(msg_len):
    code_len = 128
    rng = np.random.default_rng(msg_len)
    words_org = (WORD_STR.encode("utf-8")) * 64
    arr = np.frombuffer(words_org, dtype=np.uint8).copy()
    idx = np.arange(len(arr))
    noise_mask = (idx % code_len) >= msg_len
    arr[noise_mask] ^= rng.integers(0, 256, int(noise_mask.sum())).astype(np.uint8)
    words = arr.tobytes()

    dict_size = (1 << min((code_len - msg_len) * 2, 8)) - 1
    gd_dedup = make_gd("rs", dict_size, n=code_len, k=msg_len)
    gd_dup = make_gd("rs", dict_size, n=code_len, k=msg_len)
    x = gd_dedup.dedup(words)
    y = gd_dup.dup(x)
    assert y == words
    assert len(x.data) < len(words)


def test_rs_error_alignment_roundtrip():
    trans = np.array(
        [[1, 0, 0, 0], [1, 1, 1, 4], [1, 1, 3, 0], [1, 2, 0, 0]], dtype=np.uint8
    )
    gd_dedup = make_gd("rs", 15, n=4, k=3)
    gd_dup = make_gd("rs", 15, n=4, k=3)
    gd_dedup.set_error_alignment(trans)
    gd_dup.set_error_alignment(trans)
    words = WORD_STR.encode("utf-8") * 64
    x = gd_dedup.dedup(words)
    y = gd_dup.dup(x)
    assert y == words


def test_unaligned_length_padding():
    """last_chunk_pad_bytelen bookkeeping: lengths not divisible by n."""
    for extra in [1, 3, 7]:
        words = (WORD_STR.encode("utf-8") * 8) + b"x" * extra
        gd_dedup = make_gd("rs", 63, n=8, k=6)
        gd_dup = make_gd("rs", 63, n=8, k=6)
        assert gd_dup.dup(gd_dedup.dedup(words)) == words

        gd_dedup = make_gd("hamming", 63, deg=4)
        gd_dup = make_gd("hamming", 63, deg=4)
        assert gd_dup.dup(gd_dedup.dedup(words)) == words


def test_streaming_blocks_share_dictionary():
    """Mirror of examples/main.rs:36-61: dictionary state persists across
    sequential blocks through one GD instance pair."""
    words = (WORD_STR * 32).encode("utf-8")
    block = 512
    gd_dedup = make_gd("rs", 15, n=5, k=4)
    gd_dup = make_gd("rs", 15, n=5, k=4)
    out = bytearray()
    total_dedup = 0
    for off in range(0, len(words), block):
        buf = words[off : off + block]
        x = gd_dedup.dedup(buf)
        total_dedup += len(x.data)
        out.extend(gd_dup.dup(x))
    assert bytes(out) == words
    assert total_dedup < len(words)
