"""Date-string → epoch-float parsing, matching the reference.

Reference semantics (itext2kg/atom/atom.py:111-134,
atom/models/relationship.py:38-72): each timestamp string is parsed with
``dateutil.parser.parse(s).timestamp()``; unparseable strings are skipped
silently (warning only) — the slot is simply dropped, never None.

We vectorize by memoizing distinct strings per batch (transcript worlds
repeat a small set of date strings massively).
"""

from __future__ import annotations

from typing import Iterable

from dateutil import parser as _dateutil_parser


def parse_timestamp(s: str) -> float | None:
    """Parse one date string → epoch seconds, or None if unparseable."""
    try:
        dt = _dateutil_parser.parse(s)
    except Exception:
        return None
    return dt.timestamp() if dt is not None else None


class TimestampParser:
    """Memoizing parser — build once per actor / per stage."""

    def __init__(self) -> None:
        self._cache: dict[str, float | None] = {}

    def parse_one(self, s: str) -> float | None:
        try:
            return self._cache[s]
        except KeyError:
            v = parse_timestamp(s)
            self._cache[s] = v
            return v

    def parse_list(self, strings: Iterable[str] | None) -> list[float]:
        """Parse a list of date strings, silently skipping unparseable ones
        (atom.py:124-133)."""
        if not strings:
            return []
        out = []
        for s in strings:
            if s is None:
                continue
            v = self.parse_one(s)
            if v is not None:
                out.append(v)
        return out
