"""Hamming(2^m - 1, 2^m - 1 - m) syndrome codec, numpy-vectorized.

Behavioral parity with the reference (`/root/reference/src/libecc/src/hamming/mod.rs`):

* ``decode(cw)`` -> base = info bits of the syndrome-corrected codeword,
  deviation = the m-bit syndrome (`hamming/mod.rs:72-87`).
* ``encode(info, dev)`` -> systematic re-encode + re-apply the deviation's
  single-bit flip (`hamming/mod.rs:89-108`).

The syndrome tables are *derived* from the public primitive polynomials
(`hamming/constant.rs:4-14` documents the same polynomials): the syndrome of
a single error at 1-indexed position p in an n-bit word (MSB-first) is the
residue of x^(n-p) modulo the degree-m primitive polynomial. The reference
validates its tables against exactly this construction
(`hamming/mod.rs:176-202`, ``get_residue`` in `hamming/util.rs:35-70`).

Codewords are represented as (B, n) uint8 0/1 numpy arrays, MSB-first.
"""

from __future__ import annotations

import numpy as np

# deg m -> primitive polynomial over GF(2), as an integer bit mask.
PRIMITIVE_POLYNOMIALS: dict[int, int] = {
    3: 0x0B,  # x^3 + x + 1
    4: 0x13,  # x^4 + x + 1
    5: 0x25,  # x^5 + x^2 + 1
    6: 0x43,  # x^6 + x + 1
    7: 0x89,  # x^7 + x^3 + 1
    8: 0x11D,  # x^8 + x^4 + x^3 + x^2 + 1
    9: 0x211,  # x^9 + x^4 + 1
    10: 0x409,  # x^10 + x^3 + 1
}


def _poly_mod(value: int, poly: int) -> int:
    """Residue of the GF(2) polynomial ``value`` modulo ``poly``."""
    deg = poly.bit_length() - 1
    while value.bit_length() - 1 >= deg and value:
        shift = value.bit_length() - poly.bit_length()
        value ^= poly << shift
    return value


def build_syndrome_tables(deg: int) -> tuple[np.ndarray, np.ndarray]:
    """(error_pos_to_syndrome[n+1], syndrome_to_error_pos[2^m]) for degree m.

    Position 0 means "no error" (syndrome 0), mirroring the reference's
    table convention (`hamming/constant.rs:17+`).
    """
    poly = PRIMITIVE_POLYNOMIALS[deg]
    n = (1 << deg) - 1
    pos_to_syn = np.zeros(n + 1, dtype=np.int64)
    syn_to_pos = np.zeros(1 << deg, dtype=np.int64)
    for pos in range(1, n + 1):
        syn = _poly_mod(1 << (n - pos), poly)
        pos_to_syn[pos] = syn
        syn_to_pos[syn] = pos
    return pos_to_syn, syn_to_pos


class Hamming:
    """Bit-unit code: chunk = n bits, base = k info bits, deviation = m bits."""

    def __init__(self, deg: int):
        if deg not in PRIMITIVE_POLYNOMIALS:
            raise ValueError(f"unsupported Hamming degree {deg}")
        self.deg = deg
        self.code_bit_len = (1 << deg) - 1
        self.info_bit_len = self.code_bit_len - deg
        self.pos_to_syn, self.syn_to_pos = build_syndrome_tables(deg)

    # -- batched kernels (B, n) uint8 0/1 arrays, MSB-first ----------------

    def calc_syndrome(self, cw: np.ndarray) -> np.ndarray:
        """(B, n) -> (B,) int64 syndrome values.

        XOR-fold of the per-position syndrome constants over set bits
        (parity of `hamming/mod.rs:34-46`, vectorized).
        """
        cw = np.atleast_2d(np.asarray(cw, dtype=np.uint8))
        contrib = np.where(cw.astype(bool), self.pos_to_syn[1:][None, :], 0)
        return np.bitwise_xor.reduce(contrib, axis=1)

    def _flip_by_syndrome(self, cw: np.ndarray, syn: np.ndarray) -> np.ndarray:
        """Flip, per row, the single error bit named by the syndrome
        (`hamming/mod.rs:48-57`). syn==0 rows are untouched."""
        out = cw.copy()
        err_pos = self.syn_to_pos[syn]  # 1-indexed, 0 = no error
        rows = np.nonzero(err_pos > 0)[0]
        cols = err_pos[rows] - 1
        out[rows, cols] ^= 1
        return out

    def decode(self, cw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(B, n) bits -> (base (B, k) bits, deviation (B,) syndrome ints)."""
        cw = np.atleast_2d(np.asarray(cw, dtype=np.uint8))
        assert cw.shape[1] == self.code_bit_len, cw.shape
        syn = self.calc_syndrome(cw)
        corrected = self._flip_by_syndrome(cw, syn)
        return corrected[:, : self.info_bit_len], syn

    def encode(self, info: np.ndarray, dev_syn: np.ndarray) -> np.ndarray:
        """(base (B, k) bits, deviation (B,) ints) -> (B, n) codeword bits."""
        info = np.atleast_2d(np.asarray(info, dtype=np.uint8))
        dev_syn = np.asarray(dev_syn, dtype=np.int64).reshape(-1)
        b = info.shape[0]
        assert info.shape[1] == self.info_bit_len
        cw = np.zeros((b, self.code_bit_len), dtype=np.uint8)
        cw[:, : self.info_bit_len] = info
        parity = self.calc_syndrome(cw)
        # parity bits, MSB-first, appended after info bits
        shifts = np.arange(self.deg - 1, -1, -1, dtype=np.int64)
        cw[:, self.info_bit_len :] = ((parity[:, None] >> shifts[None, :]) & 1).astype(
            np.uint8
        )
        return self._flip_by_syndrome(cw, dev_syn)

    @staticmethod
    def syndrome_to_bits(syn: np.ndarray, deg: int) -> np.ndarray:
        """(B,) ints -> (B, m) MSB-first bits."""
        syn = np.asarray(syn, dtype=np.int64).reshape(-1)
        shifts = np.arange(deg - 1, -1, -1, dtype=np.int64)
        return ((syn[:, None] >> shifts[None, :]) & 1).astype(np.uint8)

    @staticmethod
    def bits_to_syndrome(bits: np.ndarray) -> np.ndarray:
        """(B, m) MSB-first bits -> (B,) ints."""
        bits = np.atleast_2d(np.asarray(bits, dtype=np.int64))
        m = bits.shape[1]
        weights = 1 << np.arange(m - 1, -1, -1, dtype=np.int64)
        return bits @ weights
