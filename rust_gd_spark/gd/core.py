"""GD dedup/dup codecs: chunking, dictionary pass, packed bitstream.

Behavioral parity with the reference driver crate:

* byte-unit (RS) path — `/root/reference/src/gd_byte_unit.rs`
* bit-unit (Hamming) path — `/root/reference/src/gd_bit_unit.rs`
* record format ``[separator(1 bit)][id | base][deviation]``, final
  byte-alignment, ``last_chunk_pad_bytelen`` bookkeeping, and the 7-bit
  tail guard on parse (`gd_byte_unit.rs:112-115`).
* separator: 0 = AsIs (base inlined, receiver replays ``put_base``),
  1 = Deduped (dict id follows) — `src/separator.rs:4-26`.

Chunk decompose/encode is numpy-batched; only the (inherently stateful,
order-dependent) LRU dictionary pass is a Python loop. On Spark this codec
runs per-conversation inside ``applyInPandas`` groups, so each loop touches
only one conversation's chunks — conversations parallelize across executors.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .basis_dict import BasisDict
from .hamming import Hamming
from .rs import ReedSolomon


@dataclass
class Deduped:
    """Packed GD output (mirror of `src/lib.rs:90-94`)."""

    data: bytes
    last_chunk_pad_bytelen: int


class _BitWriter:
    def __init__(self) -> None:
        self._parts: list[np.ndarray] = []

    def write_bit(self, b: int) -> None:
        self._parts.append(np.array([b], dtype=np.uint8))

    def write_bits(self, bits: np.ndarray) -> None:
        self._parts.append(np.asarray(bits, dtype=np.uint8).reshape(-1))

    def write_uint(self, value: int, nbits: int) -> None:
        shifts = np.arange(nbits - 1, -1, -1)
        self._parts.append(((value >> shifts) & 1).astype(np.uint8))

    def getvalue(self) -> bytes:
        if not self._parts:
            return b""
        bits = np.concatenate(self._parts)
        return np.packbits(bits).tobytes()  # force_align: zero-pad to byte


def _chunk_bytes(buf: bytes, chunk_bytelen: int) -> tuple[np.ndarray, int]:
    """Split into fixed chunks; last chunk left-padded with zero bytes
    (`gd_byte_unit.rs:42-65`). Returns ((B, chunk_bytelen) uint8, pad)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    residue = len(arr) % chunk_bytelen
    if residue == 0:
        chunks = arr.reshape(-1, chunk_bytelen)
        return chunks, 0
    pad = chunk_bytelen - residue
    head = arr[: len(arr) - residue].reshape(-1, chunk_bytelen)
    last = np.concatenate([np.zeros(pad, dtype=np.uint8), arr[len(arr) - residue :]])
    return np.concatenate([head, last[None, :]], axis=0), pad


class ByteGD:
    """RS-backed GD over byte chunks (chunk_bytelen = n)."""

    def __init__(self, code: ReedSolomon, dict_size: int):
        self.code = code
        self.basis_dict = BasisDict(dict_size)
        self.chunk_bytelen = code.code_symbol_len

    def set_error_alignment(self, t: np.ndarray) -> None:
        self.code.set_precoding(t)

    def dedup(self, buf: bytes) -> Deduped:
        if len(buf) == 0:
            return Deduped(b"", 0)
        chunks, pad = _chunk_bytes(buf, self.chunk_bytelen)
        bases, devs = self.code.decode(chunks)
        dev_bits = np.unpackbits(devs, axis=1)
        base_bits = np.unpackbits(bases, axis=1)
        w = _BitWriter()
        id_bitlen = self.basis_dict.id_bitlen
        for i in range(bases.shape[0]):
            key = bases[i].tobytes()
            hit = self.basis_dict.get_id(key)
            if hit is not None:
                w.write_bit(1)
                w.write_uint(hit, id_bitlen)
            else:
                self.basis_dict.put_base(key)
                w.write_bit(0)
                w.write_bits(base_bits[i])
            w.write_bits(dev_bits[i])
        return Deduped(w.getvalue(), pad)

    def dup(self, deduped: Deduped) -> bytes:
        if len(deduped.data) == 0:
            return b""
        bits = np.unpackbits(np.frombuffer(deduped.data, dtype=np.uint8))
        n, k = self.code.code_symbol_len, self.code.info_symbol_len
        info_bitlen, dev_bitlen = k * 8, (n - k) * 8
        id_bitlen = self.basis_dict.id_bitlen
        bases: list[bytes] = []
        devs: list[np.ndarray] = []
        ptr = 0
        while ptr < len(bits) - 7:  # tolerate <=7 alignment pad bits
            sep = bits[ptr]
            ptr += 1
            if sep == 0:  # AsIs: inline base, replay dictionary insert
                base = np.packbits(bits[ptr : ptr + info_bitlen]).tobytes()
                self.basis_dict.put_base(base)
                ptr += info_bitlen
            else:  # Deduped: id follows
                id_bits = bits[ptr : ptr + id_bitlen].astype(np.int64)
                base_id = int(id_bits @ (1 << np.arange(id_bitlen - 1, -1, -1)))
                base = self.basis_dict.get_base(base_id)
                ptr += id_bitlen
            devs.append(bits[ptr : ptr + dev_bitlen])
            ptr += dev_bitlen
            bases.append(base)
        base_arr = np.frombuffer(b"".join(bases), dtype=np.uint8).reshape(-1, k)
        dev_arr = np.packbits(np.stack(devs), axis=1)
        chunks = self.code.encode(base_arr, dev_arr)
        out = chunks.reshape(-1)
        if deduped.last_chunk_pad_bytelen:
            # drop the zero padding at the *front of the last chunk*
            last = chunks[-1, deduped.last_chunk_pad_bytelen :]
            out = np.concatenate([chunks[:-1].reshape(-1), last])
        return out.tobytes()


class BitGD:
    """Hamming-backed GD over bit chunks.

    chunk_bytelen = floor(n/8); each chunk is front-padded with
    ``n - 8*chunk_bytelen`` zero bits to fill the codeword (byte alignment,
    `gd_bit_unit.rs:44-62`, `/root/reference/README.md:118-122`).
    """

    def __init__(self, code: Hamming, dict_size: int):
        if code.code_bit_len < 8:
            raise ValueError("insufficient code length")
        self.code = code
        self.basis_dict = BasisDict(dict_size)
        self.chunk_bytelen = (code.code_bit_len - code.code_bit_len % 8) // 8

    def dedup(self, buf: bytes) -> Deduped:
        if len(buf) == 0:
            return Deduped(b"", 0)
        chunks, pad = _chunk_bytes(buf, self.chunk_bytelen)
        n = self.code.code_bit_len
        code_pad_len = n - self.chunk_bytelen * 8
        bits = np.unpackbits(chunks, axis=1)
        cw = np.zeros((bits.shape[0], n), dtype=np.uint8)
        cw[:, code_pad_len:] = bits
        bases, syns = self.code.decode(cw)
        dev_bits = Hamming.syndrome_to_bits(syns, self.code.deg)
        w = _BitWriter()
        id_bitlen = self.basis_dict.id_bitlen
        packed_bases = np.packbits(bases, axis=1)
        for i in range(bases.shape[0]):
            key = packed_bases[i].tobytes()
            hit = self.basis_dict.get_id(key)
            if hit is not None:
                w.write_bit(1)
                w.write_uint(hit, id_bitlen)
            else:
                self.basis_dict.put_base(key)
                w.write_bit(0)
                w.write_bits(bases[i])
            w.write_bits(dev_bits[i])
        return Deduped(w.getvalue(), pad)

    def dup(self, deduped: Deduped) -> bytes:
        if len(deduped.data) == 0:
            return b""
        bits = np.unpackbits(np.frombuffer(deduped.data, dtype=np.uint8))
        n, k, m = self.code.code_bit_len, self.code.info_bit_len, self.code.deg
        id_bitlen = self.basis_dict.id_bitlen
        base_rows: list[np.ndarray] = []
        dev_rows: list[np.ndarray] = []
        ptr = 0
        while ptr < len(bits) - 7:
            sep = bits[ptr]
            ptr += 1
            if sep == 0:
                base_bits = bits[ptr : ptr + k].copy()
                self.basis_dict.put_base(np.packbits(base_bits).tobytes())
                ptr += k
            else:
                id_bits = bits[ptr : ptr + id_bitlen].astype(np.int64)
                base_id = int(id_bits @ (1 << np.arange(id_bitlen - 1, -1, -1)))
                packed = self.basis_dict.get_base(base_id)
                base_bits = np.unpackbits(np.frombuffer(packed, dtype=np.uint8))[:k]
                ptr += id_bitlen
            dev_rows.append(bits[ptr : ptr + m])
            ptr += m
            base_rows.append(base_bits)
        syns = Hamming.bits_to_syndrome(np.stack(dev_rows))
        cw = self.code.encode(np.stack(base_rows), syns)
        code_pad_len = n - self.chunk_bytelen * 8
        out_bits: list[np.ndarray] = []
        last = cw.shape[0] - 1
        for i in range(cw.shape[0]):
            start = code_pad_len + (
                deduped.last_chunk_pad_bytelen * 8 if i == last else 0
            )
            out_bits.append(cw[i, start:])
        return np.packbits(np.concatenate(out_bits)).tobytes()


def make_gd(
    kind: str, dict_size: int, precoding=None, **params
) -> ByteGD | BitGD:
    """Factory mirroring ``GD::setup`` (`src/lib.rs:21-41`).

    make_gd("rs", dict_size, n=128, k=124) or
    make_gd("hamming", dict_size, deg=8).

    ``precoding``: optional n×n error-alignment matrix T (RS only — the
    reference's third entry point, `src/lib.rs:73-78`; Hamming errors out
    exactly as the reference does, `src/gd_bit_unit.rs` has no T hook).
    """
    if kind == "rs":
        gd = ByteGD(ReedSolomon(params["n"], params["k"]), dict_size)
        if precoding is not None:
            gd.set_error_alignment(np.asarray(precoding, dtype=np.uint8))
        return gd
    if kind == "hamming":
        if precoding is not None:
            raise ValueError(
                "error alignment is not supported for Hamming "
                "(mirrors `src/lib.rs:73-78` returning an error)"
            )
        return BitGD(Hamming(params["deg"]), dict_size)
    raise ValueError(f"unknown GD kind {kind!r}")
