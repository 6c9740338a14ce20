"""Minimal standards-compliant FITS writer/reader (pure Python + NumPy).

astropy is not available in this environment, so wayne_tpu carries its own
FITS layer. The format is simple: 2880-byte header blocks of 80-character
keyword cards, then big-endian data padded to 2880 bytes. This module
implements exactly what WFC3 ``ima``-style products need — a data-less
primary HDU plus IMAGE extensions with BITPIX -32 / 16 / 32 — and a reader
for round-trip tests and downstream tooling.

A native C++ fast path (wayne_tpu/native) assembles the same byte layout
for high-throughput visit output; this module is the reference
implementation and fallback.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

BLOCK = 2880
CARD = 80

_BITPIX = {np.dtype(">i2"): 16, np.dtype(">i4"): 32, np.dtype(">f4"): -32,
           np.dtype(">f8"): -64}
_DTYPES = {16: ">i2", 32: ">i4", -32: ">f4", -64: ">f8", 8: "u1"}


def _fmt_value(value: Any) -> str:
    if isinstance(value, bool):
        return "T" if value else "F"
    if isinstance(value, (int, np.integer)):
        return str(int(value))
    if isinstance(value, (float, np.floating)):
        s = f"{float(value):.12G}"
        if "." not in s and "E" not in s and "N" not in s:
            s += "."
        return s
    # header cards are ASCII by definition; replace anything else rather
    # than raising mid-visit-write on e.g. a unicode target name
    s = str(value).encode("ascii", "replace").decode("ascii")
    s = s.replace("'", "''")
    return f"'{s:<8s}'"


def card(key: str, value: Any = None, comment: str = "") -> bytes:
    """Format one 80-byte header card."""
    key = key.upper()[:8]
    if value is None and not comment:
        return f"{key:<80s}".encode("ascii")
    if key in ("COMMENT", "HISTORY", ""):
        return f"{key:<8s}{str(value or comment):<72s}"[:80].encode("ascii")
    v = _fmt_value(value)
    if v.startswith("'") and len(v) > 70:
        # Truncate the VALUE, never the syntax: a blind [:80] on the
        # body would cut the closing quote and corrupt the card (the
        # reader would swallow the rest of the card as the value).
        inner = v[1:-1][:67]
        if inner.count("'") % 2:          # never split an escaped ''
            inner = inner[:-1]
        v = f"'{inner}'"
    if v.startswith("'"):
        body = f"{key:<8s}= {v}"
    else:
        body = f"{key:<8s}= {v:>20s}"
    if comment:
        body += f" / {comment}"
    return f"{body:<80s}"[:80].encode("ascii")


def _pad(b: bytes, fill: bytes = b" ") -> bytes:
    rem = (-len(b)) % BLOCK
    return b + fill * rem


@dataclass
class FitsHDU:
    """One HDU: ordered header cards + optional image data."""

    name: str = ""
    ver: int = 1
    data: np.ndarray | None = None
    header: dict[str, Any] = field(default_factory=dict)
    comments: dict[str, str] = field(default_factory=dict)

    def to_bytes(self, primary: bool) -> bytes:
        cards: list[bytes] = []
        data = self.data
        if data is not None:
            data = np.ascontiguousarray(data)
            be = data.dtype.newbyteorder(">")
            data = data.astype(be, copy=False)
            bitpix = _BITPIX[np.dtype(be)]
        if primary:
            cards.append(card("SIMPLE", True, "conforms to FITS standard"))
            cards.append(card("BITPIX", bitpix if data is not None else 8))
            cards.append(card("NAXIS", 0 if data is None else data.ndim))
        else:
            cards.append(card("XTENSION", "IMAGE", "image extension"))
            cards.append(card("BITPIX", bitpix if data is not None else 8))
            cards.append(card("NAXIS", 0 if data is None else data.ndim))
        if data is not None:
            for i, n in enumerate(reversed(data.shape)):
                cards.append(card(f"NAXIS{i + 1}", int(n)))
        if not primary:
            cards.append(card("PCOUNT", 0))
            cards.append(card("GCOUNT", 1))
            if self.name:
                cards.append(card("EXTNAME", self.name))
                cards.append(card("EXTVER", self.ver))
        else:
            cards.append(card("EXTEND", True, "file contains extensions"))
            if self.name:
                cards.append(card("EXTNAME", self.name))
        for key, value in self.header.items():
            cards.append(card(key, value, self.comments.get(key, "")))
        cards.append(card("END"))
        out = _pad(b"".join(cards))
        if data is not None:
            # the FITS standard zero-fills DATA blocks (headers are
            # space-filled) — space padding here would diverge from the
            # native writer and trip strict validators
            out += _pad(data.tobytes(), fill=b"\0")
        return out


def header_only_bytes(*, primary: bool, name: str = "", ver: int = 1,
                      shape: tuple[int, ...] = (), bitpix: int = -32,
                      header: dict[str, Any] | None = None) -> bytes:
    """Render just the (padded) header block for an HDU of known shape.

    Used by the native writer, which streams the data section itself.
    """
    cards: list[bytes] = []
    if primary:
        cards.append(card("SIMPLE", True, "conforms to FITS standard"))
    else:
        cards.append(card("XTENSION", "IMAGE", "image extension"))
    cards.append(card("BITPIX", bitpix if shape else 8))
    cards.append(card("NAXIS", len(shape)))
    for i, n in enumerate(reversed(shape)):
        cards.append(card(f"NAXIS{i + 1}", int(n)))
    if not primary:
        cards.append(card("PCOUNT", 0))
        cards.append(card("GCOUNT", 1))
        if name:
            cards.append(card("EXTNAME", name))
            cards.append(card("EXTVER", ver))
    else:
        cards.append(card("EXTEND", True, "file contains extensions"))
    for key, value in (header or {}).items():
        cards.append(card(key, value))
    cards.append(card("END"))
    return _pad(b"".join(cards))


def write_fits(path: str, hdus: list[FitsHDU]) -> None:
    """Write HDUs to ``path`` (first HDU is primary)."""
    with open(path, "wb") as fh:
        for i, hdu in enumerate(hdus):
            fh.write(hdu.to_bytes(primary=(i == 0)))


def _parse_header(raw: bytes, start: int = 0) -> tuple[dict[str, Any], int]:
    """Parse header cards from ``raw`` at ``start``; returns
    (header, bytes consumed). Takes the whole buffer plus an offset so
    callers never slice-copy the remaining file per HDU (a 64 MB ima
    has ~80 HDUs — tail copies made reads O(N^2))."""
    header: dict[str, Any] = {}
    pos = start
    while True:
        block = raw[pos: pos + BLOCK]
        if len(block) < BLOCK:
            raise ValueError("truncated FITS header")
        pos += BLOCK
        done = False
        for i in range(0, BLOCK, CARD):
            c = block[i: i + CARD].decode("ascii", errors="replace")
            key = c[:8].strip()
            if key == "END":
                done = True
                break
            if not key or c[8:10] != "= ":
                continue
            body = c[10:]
            if body.lstrip().startswith("'"):
                s = body.lstrip()[1:]
                # FITS escapes a quote inside a string as '' — scan for the
                # first single (unpaired) closing quote.
                out = []
                j = 0
                while j < len(s):
                    if s[j] == "'":
                        if j + 1 < len(s) and s[j + 1] == "'":
                            out.append("'")
                            j += 2
                            continue
                        break
                    out.append(s[j])
                    j += 1
                header[key] = "".join(out).rstrip()
            else:
                v = body.split("/")[0].strip()
                if v == "T":
                    header[key] = True
                elif v == "F":
                    header[key] = False
                else:
                    try:
                        header[key] = int(v)
                    except ValueError:
                        try:
                            header[key] = float(v)
                        except ValueError:
                            header[key] = v
        if done:
            break
    return header, pos - start


def read_fits(path: str) -> list[tuple[dict[str, Any], np.ndarray | None]]:
    """Read all HDUs: list of (header, data) with data in native byte order."""
    with open(path, "rb") as fh:
        raw = fh.read()
    out: list[tuple[dict[str, Any], np.ndarray | None]] = []
    pos = 0
    while pos < len(raw):
        header, used = _parse_header(raw, pos)
        pos += used
        naxis = int(header.get("NAXIS", 0))
        data = None
        if naxis > 0:
            shape = tuple(int(header[f"NAXIS{i}"]) for i in range(naxis, 0, -1))
            dtype = np.dtype(_DTYPES[int(header["BITPIX"])])
            count = int(np.prod(shape))
            nbytes = count * dtype.itemsize
            data = np.frombuffer(raw, dtype=dtype, count=count,
                                 offset=pos).reshape(shape)
            data = data.astype(data.dtype.newbyteorder("="))
            pos += nbytes + ((-nbytes) % BLOCK)
        out.append((header, data))
    return out
