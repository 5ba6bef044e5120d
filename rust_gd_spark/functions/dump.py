"""Byte/bit dump utilities — the reference's debug helpers (A30).

Reference: `src/libecc/src/util.rs:4-39` (`hexdump`, `bitdump` over byte
slices) and `src/libecc/src/hamming/util.rs:4-32` (bit-vector dumps used by
the golden tests). Here they exist in two forms:

* column expressions (``hex_col``, ``bits_col``) — JVM-side, codegen-
  friendly, for inspecting binary columns in DataFrames;
* plain-Python helpers (``hexdump``, ``bitdump``) — for kernel-level
  debugging and golden tests, mirroring the reference's output shape
  (lowercase hex / MSB-first bit string, no separators).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def hex_col(col) -> Column:
    """Lowercase hex of a binary/string column (reference hexdump)."""
    return F.lower(F.hex(col))


def bits_col(col) -> Column:
    """MSB-first bit string of a binary column (reference bitdump).

    JVM-side: per-byte lookup into a 256-entry map via conv(hex, 16, 2)
    padded to 8 bits, concatenated with a higher-order transform.
    """
    byte_bits = lambda b: F.lpad(F.conv(F.hex(b), 16, 2), 8, "0")  # noqa: E731
    # split the binary into single bytes via substring on the binary column
    n = F.length(col)
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: byte_bits(F.substring(col, i, 1)),
        ),
        "",
    )


def hexdump(data: bytes) -> str:
    """Lowercase hex string, e.g. b'\\x0f\\xa0' -> '0fa0'."""
    return data.hex()


def bitdump(data: bytes) -> str:
    """MSB-first bit string, e.g. b'\\xa0' -> '10100000'."""
    return "".join(f"{b:08b}" for b in data)
