"""Driver-side helpers (SURVEY.md §2.8 F10): kept for API parity with
the reference's utility surface."""

from __future__ import annotations


def humanize_bytes(n: int) -> str:
    """Byte-size humanizer (reference ``clickhouse/v1/operator.py:
    19-38``)."""
    size = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB", "PB"):
        if abs(size) < 1024.0 or unit == "PB":
            return f"{size:.1f} {unit}"
        size /= 1024.0
    return f"{size:.1f} PB"


def column_letter(index: int) -> str:
    """1-based column index → spreadsheet letters (reference
    ``coinprice/utils.py:151-157``): 1→A, 26→Z, 27→AA."""
    if index < 1:
        raise ValueError("column index is 1-based")
    out = ""
    while index > 0:
        index, rem = divmod(index - 1, 26)
        out = chr(ord("A") + rem) + out
    return out
