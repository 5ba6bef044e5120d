"""Reed-Solomon GD codec golden tests.

Vectors from the reference (`/root/reference/src/libecc/src/rs/mod.rs:166-292`):
the exact RS(10,4) systematic parity matrix P and encode/decode identities.
"""

import numpy as np

from rust_gd_spark.gd.gf256 import gf_mul
from rust_gd_spark.gd.rs import ReedSolomon

RS10_4_PARITY = np.array(
    [
        [64, 231, 229, 158, 164, 178],
        [120, 210, 191, 71, 219, 188],
        [54, 87, 7, 140, 217, 213],
        [15, 99, 92, 84, 167, 218],
    ],
    dtype=np.uint8,
)


def test_generator_parity_golden():
    rs = ReedSolomon(10, 4)
    assert np.array_equal(rs.generator_parity, RS10_4_PARITY)


def test_encode_golden():
    rs = ReedSolomon(10, 4)
    # zero message, zero dev -> zero codeword
    assert np.array_equal(
        rs.encode(np.zeros((1, 4), np.uint8), np.zeros((1, 6), np.uint8)),
        np.zeros((1, 10), np.uint8),
    )
    # all-ones message: parity = XOR of P rows, then dev XORed on top
    msg = np.ones((1, 4), np.uint8)
    dev = np.ones((1, 6), np.uint8)
    expect_parity = np.bitwise_xor.reduce(RS10_4_PARITY, axis=0) ^ 1
    out = rs.encode(msg, dev)
    assert np.array_equal(out[0, :4], msg[0])
    assert np.array_equal(out[0, 4:], expect_parity)
    # message 0,1,2,3 with zero dev: parity = XOR_i mul(P[i], i)
    msg = np.arange(4, dtype=np.uint8)[None, :]
    expect = np.zeros(6, np.uint8)
    for i in range(4):
        expect ^= gf_mul(RS10_4_PARITY[i], np.uint8(i))
    out = rs.encode(msg, np.zeros((1, 6), np.uint8))
    assert np.array_equal(out[0, 4:], expect)


def test_decode_encode_identity():
    rs = ReedSolomon(10, 4)
    msg = np.arange(4, dtype=np.uint8)[None, :]
    for dev in [np.zeros((1, 6), np.uint8), np.arange(6, 0, -1, dtype=np.uint8)[None, :]]:
        cw = rs.encode(msg, dev)
        base, d = rs.decode(cw)
        assert np.array_equal(base, msg)
        assert np.array_equal(d, dev)


def test_roundtrip_random_batch():
    rng = np.random.default_rng(1)
    for n, k in [(10, 4), (128, 124), (5, 4), (255, 223)]:
        rs = ReedSolomon(n, k)
        chunks = rng.integers(0, 256, (32, n)).astype(np.uint8)
        base, dev = rs.decode(chunks)
        assert np.array_equal(base, chunks[:, :k])  # base = c_l by design
        back = rs.encode(base, dev)
        assert np.array_equal(back, chunks)


def test_precoding_roundtrip():
    # the 4x4 error-alignment matrix from the reference test (src/lib.rs:199-204)
    t = np.array(
        [[1, 0, 0, 0], [1, 1, 1, 4], [1, 1, 3, 0], [1, 2, 0, 0]], dtype=np.uint8
    )
    rs = ReedSolomon(4, 3)
    rs.set_precoding(t)
    rng = np.random.default_rng(3)
    chunks = rng.integers(0, 256, (16, 4)).astype(np.uint8)
    base, dev = rs.decode(chunks)
    back = rs.encode(base, dev)
    assert np.array_equal(back, chunks)
