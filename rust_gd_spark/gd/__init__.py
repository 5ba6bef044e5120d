"""Faithful Generalized-Deduplication kernel.

Re-implements, from the published math and the reference's documented
behavior (``/root/reference/DESIGN.md``, ``src/libecc``), the GD primitive:
decompose fixed-size chunks into a dictionary-deduplicable *base* and a
small *deviation* so that reconstruction is lossless.

All batch kernels are numpy-vectorized (no per-element Python in the hot
path) so they run efficiently inside Arrow-batched pandas UDFs on Spark.
"""

from .gf256 import GF256, gf_matmul, gf_mul, gf_vecmat
from .hamming import Hamming
from .rs import ReedSolomon
from .basis_dict import BasisDict
from .core import ByteGD, BitGD, Deduped, make_gd

__all__ = [
    "GF256",
    "gf_mul",
    "gf_matmul",
    "gf_vecmat",
    "Hamming",
    "ReedSolomon",
    "BasisDict",
    "ByteGD",
    "BitGD",
    "Deduped",
    "make_gd",
]
