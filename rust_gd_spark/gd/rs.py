"""Reed-Solomon (n, k) GD codec over GF(2^8), numpy-vectorized.

Implements the "base/deviation" decomposition described by the reference's
DESIGN.md (`/root/reference/DESIGN.md:20-58`):

* base      = c_l, the first k bytes of the chunk;
* deviation = c_r XOR c_l·P, where G = [I P] is the systematic generator
  matrix derived from the k x n Vandermonde over GF(2^8) with root 0x02
  (`src/libecc/src/rs/mod.rs:19-60`).

Optional *error alignment*: a nonsingular n x n precoding matrix T — decode
works on c·T, encode applies T^-1 last (`rs/mod.rs:86-99`, `105-155`,
`DESIGN.md:62-109`).

Batched: chunks are (B, n) uint8 arrays.
"""

from __future__ import annotations

import numpy as np

from .gf256 import ORDER, ROOT, gf_gauss_jordan_inverse, gf_matmul, gf_pow, gf_vecmat


# Matrix-construction memos. The systematic parity P and the alignment
# inverse T^-1 are pure functions of (n, k) / (n, T) and are read-only
# after construction, but building them costs ~70 ms each (Vandermonde +
# Gauss-Jordan over GF(2^8)) — which dominated gd_conversation_roundtrip
# (two fresh codecs per conversation group: 98% of the query's kernel
# time was matrix construction, 2% actual dedup/dup). The per-instance
# LRU dictionary stays fresh; only the immutable matrices are shared.
_PARITY_CACHE: dict[tuple[int, int], np.ndarray] = {}
_POSTCODING_CACHE: dict[tuple[int, bytes], np.ndarray] = {}


def _parity_for(n: int, k: int) -> np.ndarray:
    key = (n, k)
    p = _PARITY_CACHE.get(key)
    if p is None:
        # Vandermonde V[row, col] = alpha^(row*col), rows 0..k, cols 0..n
        v = np.zeros((k, n), dtype=np.uint8)
        for row in range(k):
            for col in range(n):
                v[row, col] = gf_pow(ROOT, row * col)
        left_inv = gf_gauss_jordan_inverse(v[:, :k])
        g = gf_matmul(left_inv, v)  # systematic generator matrix [I P]
        p = g[:, k:].copy()  # P: (k, n-k)
        p.setflags(write=False)
        _PARITY_CACHE[key] = p
    return p


class ReedSolomon:
    """Byte-unit code: chunk = n bytes, base = k bytes, deviation = n-k bytes."""

    def __init__(self, code_symbol_len: int, info_symbol_len: int):
        n, k = code_symbol_len, info_symbol_len
        if not (n > k and n < ORDER and k < ORDER and k >= 1):
            raise ValueError(f"invalid RS params ({n}, {k})")
        self.code_symbol_len = n
        self.info_symbol_len = k
        self.deviation_symbol_len = n - k
        self.generator_parity = _parity_for(n, k)
        self.precoding: np.ndarray | None = None
        self.postcoding: np.ndarray | None = None

    def set_precoding(self, t: np.ndarray) -> None:
        """Install error-alignment matrix T (n x n, nonsingular)."""
        t = np.asarray(t, dtype=np.uint8)
        if t.shape != (self.code_symbol_len, self.code_symbol_len):
            raise ValueError("error alignment matrix must be n x n")
        self.precoding = t
        key = (self.code_symbol_len, t.tobytes())
        inv = _POSTCODING_CACHE.get(key)
        if inv is None:
            inv = gf_gauss_jordan_inverse(t)  # raises if singular
            inv.setflags(write=False)
            _POSTCODING_CACHE[key] = inv
        self.postcoding = inv

    # -- batched kernels ----------------------------------------------------

    def decode(self, chunks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(B, n) bytes -> (base (B, k), deviation (B, n-k))."""
        chunks = np.atleast_2d(np.asarray(chunks, dtype=np.uint8))
        assert chunks.shape[1] == self.code_symbol_len, chunks.shape
        if self.precoding is not None:
            chunks = gf_vecmat(chunks, self.precoding)
        k = self.info_symbol_len
        base = chunks[:, :k]
        dev = chunks[:, k:] ^ gf_vecmat(base, self.generator_parity)
        return base.copy(), dev

    def encode(self, base: np.ndarray, dev: np.ndarray) -> np.ndarray:
        """(base (B, k), deviation (B, n-k)) -> (B, n) chunk bytes."""
        base = np.atleast_2d(np.asarray(base, dtype=np.uint8))
        dev = np.atleast_2d(np.asarray(dev, dtype=np.uint8))
        parity = gf_vecmat(base, self.generator_parity) ^ dev
        cw = np.concatenate([base, parity], axis=1)
        if self.postcoding is not None:
            cw = gf_vecmat(cw, self.postcoding)
        return cw
