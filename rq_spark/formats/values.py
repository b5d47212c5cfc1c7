"""Value-model helpers for the transcode path.

The reference's Map is an ORDERED LIST OF PAIRS, not a hash map
(src/value/mod.rs:43-44: "no need to deduplicate keys, and it is nice
to preserve order"): duplicate keys are legal and preserved, and keys
may be any value (MessagePack routinely produces non-string keys,
src/value/messagepack.rs:88-92). Python dicts cover the common case
(ordered since 3.7) but silently drop duplicates and reject
unhashable keys — so decoders fall back to `OrderedPairs` exactly
when a map is NOT faithfully representable as a dict, keeping the
fast/ergonomic dict for everything else (SURVEY §1.2 item 2's
array-of-pairs policy).
"""

from __future__ import annotations


class OrderedPairs:
    """An ordered multimap: list of (key, value) pairs, any key type."""

    __slots__ = ("pairs",)

    def __init__(self, pairs):
        self.pairs = list(pairs)

    def items(self):
        return iter(self.pairs)

    def __len__(self):
        return len(self.pairs)

    def __eq__(self, other):
        if isinstance(other, OrderedPairs):
            return self.pairs == other.pairs
        return NotImplemented

    def __repr__(self):
        return f"OrderedPairs({self.pairs!r})"


def map_from_pairs(pairs: list) -> "dict | OrderedPairs":
    """dict when faithful (hashable, unique keys), else OrderedPairs."""
    d = {}
    for k, v in pairs:
        try:
            if k in d:
                return OrderedPairs(pairs)
            d[k] = v
        except TypeError:  # unhashable key (list/map key)
            return OrderedPairs(pairs)
    return d
