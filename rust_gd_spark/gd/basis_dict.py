"""Bounded LRU base<->id dictionary with the reference's exact semantics.

Parity target: `/root/reference/src/dict.rs`:

* ``id_bitlen = bit_length(dict_size)`` (`dict.rs:24`);
* ``get_id`` refreshes LRU recency on hit (`dict.rs:38-46`);
* ``put_base`` assigns ``len(dict)`` while below capacity, else evicts the
  least-recently-used entry and *reuses its id* (`dict.rs:50-63`, `93-112`);
* ``get_base`` (decompress side) also refreshes recency (`dict.rs:66-84`).

Keys are ``bytes`` (byte-unit path: the k base bytes; bit-unit path: the
packed k bits — fixed width per code, so packing is injective).
"""

from __future__ import annotations

from collections import OrderedDict


class BasisDict:
    def __init__(self, dict_size: int):
        if dict_size < 1:
            raise ValueError("dict_size must be >= 1")
        self.dict_size = dict_size
        self.id_bitlen = dict_size.bit_length()
        self._base_to_id: OrderedDict[bytes, int] = OrderedDict()
        self._id_to_base: dict[int, bytes] = {}

    def __len__(self) -> int:
        return len(self._base_to_id)

    def get_id(self, base: bytes) -> int | None:
        """Probe; refresh recency on hit (dedup side)."""
        hit = self._base_to_id.get(base)
        if hit is None:
            return None
        self._base_to_id.move_to_end(base)
        return hit

    def put_base(self, base: bytes) -> int:
        """Insert, LRU-evicting (and reusing the freed id) at capacity."""
        if len(self._base_to_id) < self.dict_size:
            new_id = len(self._base_to_id)
        else:
            lru_base, lru_id = self._base_to_id.popitem(last=False)
            del self._id_to_base[lru_id]
            new_id = lru_id
        self._base_to_id[base] = new_id
        self._id_to_base[new_id] = base
        return new_id

    def get_base(self, base_id: int) -> bytes:
        """Reverse lookup; refresh recency (dup side)."""
        base = self._id_to_base.get(base_id)
        if base is None:
            raise KeyError(f"invalid dictionary id {base_id}")
        self._base_to_id.move_to_end(base)
        return base

    def check_inner_integrity(self) -> None:
        """Mirror of `dict.rs:115-140`: both maps mutually consistent."""
        if len(self._base_to_id) != len(self._id_to_base):
            raise AssertionError("different size of dictionary")
        for base, idx in self._base_to_id.items():
            if self._id_to_base.get(idx) != base:
                raise AssertionError(f"inconsistent entry for id {idx}")
