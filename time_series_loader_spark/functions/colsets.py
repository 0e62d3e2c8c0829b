"""Column-set algebra diagnostics (O4).

Parity target: reference ``utils.py:1-64`` — union / intersection /
appears-in-exactly-one over the column lists of multiple frames. Pure
driver-side set ops on ``df.columns`` (schema metadata, no executor work).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence


def columns_union(column_lists: Iterable[Sequence[str]]) -> list[str]:
    """All column names appearing in any frame, first-seen order."""
    seen: dict[str, None] = {}
    for cols in column_lists:
        for c in cols:
            seen.setdefault(c)
    return list(seen)


def columns_intersection(column_lists: Iterable[Sequence[str]]) -> list[str]:
    """Column names present in every frame, ordered by the first frame."""
    lists = [list(c) for c in column_lists]
    if not lists:
        return []
    common = set(lists[0])
    for cols in lists[1:]:
        common &= set(cols)
    return [c for c in lists[0] if c in common]


def columns_in_exactly_one(column_lists: Iterable[Sequence[str]]) -> list[str]:
    """Column names appearing in exactly one frame (schema-drift signal)."""
    counts = Counter()
    order: dict[str, None] = {}
    for cols in column_lists:
        # dict.fromkeys: dedupe within a frame but keep first-seen order
        # (iterating set(cols) here would make output order depend on the
        # interpreter's hash seed)
        for c in dict.fromkeys(cols):
            counts[c] += 1
            order.setdefault(c)
    return [c for c in order if counts[c] == 1]
