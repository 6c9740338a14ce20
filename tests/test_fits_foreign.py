"""Foreign-FITS hardening: read files this module did NOT write.

Real MAST/astropy WFC3 products differ from wayne_tpu's own output in
ways that broke (or silently corrupted) the round-3 reader: integer
data with BSCALE/BZERO scaling (raw ima SCI planes are unsigned int16
via the BZERO=32768 convention), OGIP CONTINUE long-string cards,
ESO HIERARCH cards, blank cards before END, NUL-padded header blocks,
and BINTABLE extensions (association tables) whose PCOUNT heap must be
stepped over or every following HDU misaligns.

astropy is not available here, so the fixtures are hand-built at byte
level — which is the point: they are adversarial inputs, not
round-trips of our own writer. The end-to-end test doctors a real
simulated visit into raw-style unsigned-int16 files with an embedded
table HDU and runs the full run_reduce CLI over them.

Reference behaviour: astropy.io.fits reading MAST products
(SURVEY.md section 3.5 — header fidelity and consumption by
Iraclis/calwf3-class tooling is a functional requirement).
"""

import numpy as np
import pytest

from wayne_tpu.io.fits import BLOCK, read_fits


def _rawcard(text: str) -> bytes:
    assert len(text) <= 80
    return text.ljust(80).encode("ascii")


def _header_bytes(cards: list[bytes], nul_pad: bool = False) -> bytes:
    body = b"".join(cards) + _rawcard("END")
    fill = b"\0" if nul_pad else b" "
    return body + fill * ((-len(body)) % BLOCK)


def _data_bytes(arr: np.ndarray) -> bytes:
    b = arr.astype(arr.dtype.newbyteorder(">")).tobytes()
    return b + b"\0" * ((-len(b)) % BLOCK)


def _image_ext(arr: np.ndarray, bitpix: int, extra: list[bytes]) -> bytes:
    cards = [
        _rawcard("XTENSION= 'IMAGE   '"),
        _rawcard(f"BITPIX  = {bitpix:>20d}"),
        _rawcard(f"NAXIS   = {arr.ndim:>20d}"),
    ]
    for i, n in enumerate(reversed(arr.shape)):
        cards.append(_rawcard(f"NAXIS{i + 1}  = {n:>20d}"))
    cards += [_rawcard("PCOUNT  =                    0"),
              _rawcard("GCOUNT  =                    1")] + extra
    return _header_bytes(cards) + _data_bytes(arr)


def _bintable_ext(n_rows: int = 3, row_bytes: int = 8,
                  heap_bytes: int = 100) -> bytes:
    """A BINTABLE with a PCOUNT heap — the alignment trap."""
    cards = [
        _rawcard("XTENSION= 'BINTABLE'"),
        _rawcard("BITPIX  =                    8"),
        _rawcard("NAXIS   =                    2"),
        _rawcard(f"NAXIS1  = {row_bytes:>20d}"),
        _rawcard(f"NAXIS2  = {n_rows:>20d}"),
        _rawcard(f"PCOUNT  = {heap_bytes:>20d}"),
        _rawcard("GCOUNT  =                    1"),
        _rawcard("TFIELDS =                    1"),
        _rawcard("TTYPE1  = 'MEMNAME '"),
        _rawcard("TFORM1  = '8A      '"),
        _rawcard("EXTNAME = 'ASN     '"),
    ]
    payload = np.full(n_rows * row_bytes + heap_bytes, 7, np.uint8)
    return _header_bytes(cards) + _data_bytes(payload)


@pytest.fixture()
def foreign_file(tmp_path):
    """Primary with CONTINUE/HIERARCH/blank cards, then: unsigned-int16
    image (BZERO 32768), BINTABLE with heap, scaled-float image
    (BSCALE/BZERO), NUL-padded-header image — in that order, so a
    misread of any HDU's size corrupts all later ones."""
    long_val = "x" * 130
    primary = _header_bytes([
        _rawcard("SIMPLE  =                    T"),
        _rawcard("BITPIX  =                    8"),
        _rawcard("NAXIS   =                    0"),
        _rawcard("EXTEND  =                    T"),
        _rawcard(f"LONGSTR = '{long_val[:66]}&'"),
        _rawcard(f"CONTINUE  '{long_val[66:]}&'"),
        _rawcard("CONTINUE  ''"),
        _rawcard("HIERARCH ESO DET CHIP GAIN = 2.5"),
        _rawcard(""),                       # blank card
        _rawcard("COMMENT = not a value card"),
        _rawcard("AFTERBLK=                   42"),  # card AFTER a blank
    ])

    u16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 5000)
    img_u16 = _image_ext(
        (u16.astype(np.int32) - 32768).astype(np.int16), 16,
        [_rawcard("BZERO   =                32768"),
         _rawcard("BSCALE  =                    1"),
         _rawcard("EXTNAME = 'SCI     '"),
         _rawcard("EXTVER  =                    1")])

    table = _bintable_ext()

    f32 = np.linspace(0.0, 1.0, 6, dtype=">f4").reshape(2, 3)
    img_scaled = _image_ext(
        f32, -32,
        [_rawcard("BSCALE  =                  2.0"),
         _rawcard("BZERO   =                 10.0"),
         _rawcard("EXTNAME = 'SCALED  '")])

    tail = np.full((2, 2), 3, np.int32)
    img_nul = (_header_bytes([
        _rawcard("XTENSION= 'IMAGE   '"),
        _rawcard("BITPIX  =                   32"),
        _rawcard("NAXIS   =                    2"),
        _rawcard("NAXIS1  =                    2"),
        _rawcard("NAXIS2  =                    2"),
        _rawcard("PCOUNT  =                    0"),
        _rawcard("GCOUNT  =                    1"),
        _rawcard("EXTNAME = 'TAIL    '"),
    ], nul_pad=True) + _data_bytes(tail))

    path = tmp_path / "foreign.fits"
    path.write_bytes(primary + img_u16 + table + img_scaled + img_nul)
    return path, u16, np.asarray(f32) * 2.0 + 10.0, tail


def test_reads_foreign_quirks(foreign_file):
    path, u16, scaled, tail = foreign_file
    hdus = read_fits(str(path))
    assert len(hdus) == 5
    ph = hdus[0][0]
    # CONTINUE cards joined into one 130-char value
    assert ph["LONGSTR"] == "x" * 130
    # HIERARCH stored under its full name
    assert ph["HIERARCH ESO DET CHIP GAIN"] == 2.5
    # parsing continued past the blank card
    assert ph["AFTERBLK"] == 42

    # unsigned-int16 convention applied exactly
    h1, d1 = hdus[1]
    assert d1.dtype == np.uint16
    np.testing.assert_array_equal(d1, u16)
    assert (h1["BSCALE"], h1["BZERO"]) == (1, 0)   # never double-applied

    # table skipped, not parsed as an image
    h2, d2 = hdus[2]
    assert h2["XTENSION"].strip() == "BINTABLE" and d2 is None

    # general BSCALE/BZERO -> float64 physical values
    h3, d3 = hdus[3]
    assert h3["EXTNAME"].strip() == "SCALED" and d3.dtype == np.float64
    np.testing.assert_allclose(d3, scaled, rtol=1e-6)

    # heap stepped over: the final HDU (NUL-padded header) is intact
    h4, d4 = hdus[4]
    assert h4["EXTNAME"].strip() == "TAIL"
    np.testing.assert_array_equal(d4, tail)


def _doctor_ima_to_raw_style(path: str) -> None:
    """Rewrite an ima file the way a raw MAST product looks: SCI planes
    as BZERO-unsigned int16, an association BINTABLE appended after the
    primary, a CONTINUE long-string and blank cards in the primary."""
    hdus = read_fits(path)
    out = []
    ph = hdus[0][0]
    pcards = [
        _rawcard("SIMPLE  =                    T"),
        _rawcard("BITPIX  =                    8"),
        _rawcard("NAXIS   =                    0"),
        _rawcard("EXTEND  =                    T"),
    ]
    for k, v in ph.items():
        if k in ("SIMPLE", "BITPIX", "NAXIS", "EXTEND"):
            continue
        if isinstance(v, bool):
            pcards.append(_rawcard(f"{k:<8s}= {'T' if v else 'F':>20s}"))
        elif isinstance(v, (int, np.integer)):
            pcards.append(_rawcard(f"{k:<8s}= {int(v):>20d}"))
        elif isinstance(v, (float, np.floating)):
            pcards.append(_rawcard(f"{k:<8s}= {float(v):>20.12G}"))
        else:
            pcards.append(_rawcard(f"{k:<8s}= '{str(v):<8s}'"))
    pcards.append(_rawcard("HISTORY doctored into raw-style unsigned"))
    pcards.append(_rawcard(""))
    pcards.append(
        _rawcard("PROV    = 'hand-doctored raw-style product with a "
                 "long provenance str&'"))
    pcards.append(_rawcard("CONTINUE  'ing value'"))
    out.append(_header_bytes(pcards))
    out.append(_bintable_ext())

    for h, d in hdus[1:]:
        name = str(h.get("EXTNAME", "")).strip()
        ver = int(h.get("EXTVER", 1))
        extra = [_rawcard(f"EXTNAME = '{name:<8s}'"),
                 _rawcard(f"EXTVER  = {ver:>20d}")]
        for k in ("SAMPNUM", "SAMPTIME"):
            if k in h:
                v = h[k]
                if isinstance(v, (int, np.integer)):
                    extra.append(_rawcard(f"{k:<8s}= {int(v):>20d}"))
                else:
                    extra.append(_rawcard(f"{k:<8s}= {float(v):>20.12G}"))
        if name == "SCI":
            phys = np.clip(np.round(np.asarray(d, np.float64)), 0, 65535)
            stored = (phys.astype(np.int32) - 32768).astype(np.int16)
            extra = [_rawcard("BZERO   =                32768"),
                     _rawcard("BSCALE  =                    1")] + extra
            out.append(_image_ext(stored, 16, extra))
        else:
            arr = np.asarray(d)
            if arr.dtype.kind == "f":
                out.append(_image_ext(arr.astype(np.float32), -32, extra))
            else:
                out.append(_image_ext(arr.astype(np.int16), 16, extra))
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


@pytest.mark.slow
def test_run_reduce_consumes_raw_style_files(tmp_path):
    """End to end: simulate a visit, doctor every ima into a raw-style
    unsigned-int16 file with an embedded association table, and reduce
    it with the stock CLI — depths must still come out right (the DN
    quantisation from the uint16 round-trip is ~0.3 DN rms, well under
    the read noise)."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 4,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.14,
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 5}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=4, progress=lambda s: None)

    import glob
    for f in sorted(glob.glob(str(outdir / "*_ima.fits"))):
        _doctor_ima_to_raw_style(f)

    # the doctored SCI planes read back as unsigned physical values
    from wayne_tpu.io.ima import read_ima
    first = sorted(glob.glob(str(outdir / "*_ima.fits")))[0]
    hdr, reads, times = read_ima(first)
    assert reads.dtype == np.uint16
    assert hdr["NSAMP"] == 5 and np.isfinite(times).all()

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["n_exposures"] == 12
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c


def test_literal_trailing_ampersand_preserved(tmp_path):
    """A string value ending in '&' with NO following CONTINUE card is
    literal data (OGIP strips the '&' only when a CONTINUE follows) —
    the reader must not eat the last character."""
    cards = [
        _rawcard("SIMPLE  =                    T"),
        _rawcard("BITPIX  =                    8"),
        _rawcard("NAXIS   =                    0"),
        _rawcard("FILTER  = 'F160W&  '"),
        _rawcard("LONGVAL = 'part one &'"),
        _rawcard("CONTINUE  'part two&'"),
        _rawcard("AFTER   =                    7"),
    ]
    p = tmp_path / "amp.fits"
    p.write_bytes(_header_bytes(cards))
    hdr, _ = read_fits(str(p))[0]
    assert hdr["FILTER"] == "F160W&"
    # the joined long string: first '&' consumed (CONTINUE followed),
    # the dangling one on the last CONTINUE piece is literal
    assert hdr["LONGVAL"] == "part one part two&"
    assert hdr["AFTER"] == 7


def test_unsigned_and_hierarch_write_roundtrip(tmp_path):
    """What the hardened reader RETURNS must go back out: uint16/uint32
    arrays (written via the signed+BZERO convention) and
    'HIERARCH ...' keys (written as long-keyword cards)."""
    from wayne_tpu.io.fits import FitsHDU, write_fits

    rng = np.random.default_rng(3)
    u16 = rng.integers(0, 65536, (8, 9), dtype=np.uint16)
    u32 = rng.integers(0, 2**32, (4, 5), dtype=np.uint32)
    hdr = {"HIERARCH ESO DET CHIP GAIN": 2.5,
           "HIERARCH ESO DET NAME": "chip1",
           "PLAIN": 11}
    p = tmp_path / "u.fits"
    write_fits(str(p), [FitsHDU(data=u16, header=hdr),
                        FitsHDU(name="U32", data=u32)])
    hdus = read_fits(str(p))
    h0, d0 = hdus[0]
    np.testing.assert_array_equal(d0, u16)
    assert d0.dtype == np.uint16
    assert h0["HIERARCH ESO DET CHIP GAIN"] == 2.5
    assert h0["HIERARCH ESO DET NAME"] == "chip1"
    assert h0["PLAIN"] == 11
    h1, d1 = hdus[1]
    np.testing.assert_array_equal(d1, u32)
    assert d1.dtype == np.uint32


def test_free_text_annotation_card_not_parsed_as_key(tmp_path):
    """A nonstandard free-text card that merely CONTAINS '=' (vendor
    prose annotations) must not be parsed into a junk header key that
    could pollute headers copied into derived products; a genuine
    HIERARCH-style card without the literal prefix still parses."""
    raw = _header_bytes([
        _rawcard("SIMPLE  =                    T"),
        _rawcard("BITPIX  =                    8"),
        _rawcard("NAXIS   =                    0"),
        _rawcard("NOTE    vendor says gain=2 here"),      # prose with '='
        _rawcard("Processed by pipeline v=1.2 (beta)"),   # prose with '='
        _rawcard("ESO TEL AIRM START = 1.58"),            # implicit HIERARCH
        _rawcard("GOOD    =                    5"),
    ])
    p = tmp_path / "annot.fits"
    p.write_bytes(raw)
    hdr = read_fits(str(p))[0][0]
    assert hdr["GOOD"] == 5
    assert hdr["ESO TEL AIRM START"] == 1.58
    # neither prose card produced a key (no key containing 'vendor'/'v')
    assert not any("vendor" in k or "pipeline" in k for k in hdr)
    assert "NOTE    vendor says gain" not in hdr


def test_hierarch_card_overflow_warns_or_raises():
    """A HIERARCH body over 80 bytes must never silently lose value
    bytes: string values truncate WITH a warning (syntax preserved),
    numeric cards whose keyword alone overflows raise."""
    from wayne_tpu.io.fits import card

    name = "HIERARCH ESO " + " ".join(["LONGTOK"] * 6)
    with pytest.warns(UserWarning, match="truncated"):
        c = card(name, "v" * 60)
    assert len(c) == 80
    text = c.decode("ascii")
    # the truncated value still closes its quote
    assert text.rstrip().endswith("'") and text.count("'") == 2
    # numeric value, absurdly long keyword: loud error, not corruption
    too_long = "HIERARCH " + " ".join(["TOK"] * 25)
    with pytest.raises(ValueError, match="80-byte"):
        card(too_long, 12345)
    # in-budget HIERARCH cards are unaffected
    ok = card("HIERARCH ESO DET GAIN", 2.5, "e-/DN")
    assert len(ok) == 80 and b"2.5" in ok
