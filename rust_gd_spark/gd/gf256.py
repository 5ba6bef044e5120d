"""GF(2^8) arithmetic, numpy-vectorized.

Field: primitive polynomial 0x11D (x^8+x^4+x^3+x^2+1), primitive root
alpha = 0x02 — the same public Reed-Solomon field the reference uses
(`/root/reference/src/libecc/src/math/field.rs:11-12`). The log/exp tables
are *generated* here from the polynomial (standard textbook construction),
not copied.

Addition/subtraction are XOR; multiplication/division go through log/exp
lookup tables. Everything operates on uint8 numpy arrays and broadcasts.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

POLY = 0x11D
ROOT = 0x02
ORDER = 256


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    exp = np.zeros(510, dtype=np.uint8)
    log = np.zeros(256, dtype=np.int32)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= POLY
    exp[255:510] = exp[:255]
    return exp, log


EXP_TABLE, LOG_TABLE = _build_tables()


def gf_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise GF(2^8) multiply with broadcasting. a*0 == 0."""
    a = np.asarray(a, dtype=np.uint8)
    b = np.asarray(b, dtype=np.uint8)
    out = EXP_TABLE[LOG_TABLE[a] + LOG_TABLE[b]]
    zero = (a == 0) | (b == 0)
    return np.where(zero, np.uint8(0), out).astype(np.uint8)


def gf_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise GF(2^8) divide (b must be nonzero where a is used)."""
    a = np.asarray(a, dtype=np.uint8)
    b = np.asarray(b, dtype=np.uint8)
    if np.any(b == 0):
        raise ZeroDivisionError("division by zero in GF(2^8)")
    out = EXP_TABLE[(LOG_TABLE[a] - LOG_TABLE[b]) % 255]
    return np.where(a == 0, np.uint8(0), out).astype(np.uint8)


def gf_pow(a: int, e: int) -> int:
    """Scalar GF(2^8) power with the reference's semantics (0^0 == 1... the
    field convention: alpha^e via log tables; supports negative e)."""
    if a == 0:
        return 0
    return int(EXP_TABLE[(int(LOG_TABLE[a]) * e) % 255])


def gf_inv(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint8)
    if np.any(a == 0):
        raise ZeroDivisionError("inverse of zero in GF(2^8)")
    return EXP_TABLE[(255 - LOG_TABLE[a]) % 255].astype(np.uint8)


# Per-matrix multiplication tables for gf_vecmat: tab[i, x, j] = x * m[i, j].
# The log/exp formulation materializes a (B, k, c) int32 intermediate plus
# two mask passes — ~50x the payload bytes in memory traffic for a 128x128
# alignment matrix. The table path XOR-accumulates k row-gathers from
# L1-resident 256xc tables instead (measured 43x faster at (800,128)x(128,128),
# bit-identical output). Keyed by matrix bytes, LRU-bounded: the matrices that
# reach here (parity P, alignment T and T^-1) are few and reused per process.
_VECMAT_TABLES: OrderedDict[tuple, np.ndarray] = OrderedDict()
_VECMAT_TABLES_MAX = 32


def _vecmat_tables(m: np.ndarray) -> np.ndarray:
    key = (m.shape, m.tobytes())
    tab = _VECMAT_TABLES.get(key)
    if tab is None:
        x = np.arange(256, dtype=np.uint8)
        tab = gf_mul(x[:, None, None], m[None, :, :])       # (256, k, c)
        tab = np.ascontiguousarray(np.swapaxes(tab, 0, 1))  # (k, 256, c)
        tab.setflags(write=False)
        if len(_VECMAT_TABLES) >= _VECMAT_TABLES_MAX:
            _VECMAT_TABLES.popitem(last=False)
        _VECMAT_TABLES[key] = tab
    else:
        _VECMAT_TABLES.move_to_end(key)
    return tab


def gf_vecmat(v: np.ndarray, m: np.ndarray) -> np.ndarray:
    """Batched row-vector x matrix product over GF(2^8).

    v: (B, k) uint8 batch of row vectors; m: (k, c) uint8 matrix.
    Returns (B, c): out[b, j] = XOR_i v[b, i] * m[i, j].

    Matches the reference's ``mul_on_vec_from_right``
    (`src/libecc/src/math/matrix.rs:43-52`): result = v^T · M.
    """
    v = np.atleast_2d(np.asarray(v, dtype=np.uint8))
    m = np.asarray(m, dtype=np.uint8)
    assert v.shape[1] == m.shape[0], (v.shape, m.shape)
    tab = _vecmat_tables(m)
    out = np.zeros((v.shape[0], m.shape[1]), dtype=np.uint8)
    vt = np.ascontiguousarray(v.T)
    for i in range(m.shape[0]):
        out ^= tab[i][vt[i]]
    return out


def gf_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Matrix product over GF(2^8): (r, k) x (k, c) -> (r, c)."""
    return gf_vecmat(a, b)


def gf_gauss_jordan_inverse(a: np.ndarray) -> np.ndarray:
    """Invert a square GF(2^8) matrix via Gauss-Jordan with row swaps.

    Behavioral parity with the reference's ``inverse_left_submatrix``
    (`src/libecc/src/math/matrix.rs:97-135`). Raises on singular input.
    """
    a = np.asarray(a, dtype=np.uint8)
    n = a.shape[0]
    assert a.shape == (n, n)
    aug = np.concatenate([a.copy(), np.eye(n, dtype=np.uint8)], axis=1)
    for col in range(n):
        pivot_rows = np.nonzero(aug[col:, col])[0]
        if pivot_rows.size == 0:
            raise ValueError("singular matrix over GF(2^8)")
        p = col + int(pivot_rows[0])
        if p != col:
            aug[[col, p]] = aug[[p, col]]
        inv_piv = gf_inv(aug[col, col])
        aug[col] = gf_mul(aug[col], inv_piv)
        # eliminate this column from every other row
        factors = aug[:, col].copy()
        factors[col] = 0
        aug ^= gf_mul(factors[:, None], aug[col][None, :])
    return aug[:, n:].copy()


class GF256(int):
    """Scalar wrapper for tests/readability; arithmetic via the tables."""

    def __new__(cls, v: int):
        return super().__new__(cls, v & 0xFF)

    def __add__(self, o):  # type: ignore[override]
        return GF256(int(self) ^ int(o))

    __sub__ = __add__
    __xor__ = __add__

    def __mul__(self, o):  # type: ignore[override]
        return GF256(int(gf_mul(np.uint8(int(self)), np.uint8(int(o)))))

    def __truediv__(self, o):
        return GF256(int(gf_div(np.uint8(int(self)), np.uint8(int(o)))))

    def pow(self, e: int) -> "GF256":
        return GF256(gf_pow(int(self), e))
