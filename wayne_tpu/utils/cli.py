"""Shared CLI argument helpers for the run_* entry points."""

from __future__ import annotations


def parse_range(spec: str, name: str) -> tuple[int, int]:
    """Parse a ``LO:HI`` pixel-range CLI argument (0-based, half-open).

    One definition shared by every CLI that takes --rows/--cols style
    windows (run_reduce, run_retrieve) so the accepted syntax cannot
    diverge between them. The upper bound is validated against the
    ACTUAL frame size later, once files are read — the YAML's subarray
    may not match the directory being reduced.
    """
    try:
        lo, hi = (int(v) for v in spec.split(":"))
    except ValueError:
        raise SystemExit(f"{name} must look like LO:HI, got {spec!r}")
    if not 0 <= lo < hi:
        raise SystemExit(f"{name} {spec!r} is not an increasing "
                         "0-based range")
    return lo, hi
