"""FITS layer tests: round-trips, ima structure, native/python parity."""

import os
import tempfile

import numpy as np
import pytest

from wayne_tpu.io.fits import FitsHDU, read_fits, write_fits
from wayne_tpu.io.ima import default_primary_header, read_ima, write_ima
from wayne_tpu.io.native import native_available


def test_fits_roundtrip_types():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.fits")
        f32 = np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5
        i16 = np.arange(12, dtype=np.int16).reshape(3, 4)
        write_fits(path, [
            FitsHDU(header={"FOO": 1, "BAR": "baz", "PI": 3.25, "OK": True}),
            FitsHDU("SCI", 1, f32, {"SAMPNUM": 2}),
            FitsHDU("DQ", 1, i16),
        ])
        hdus = read_fits(path)
        assert len(hdus) == 3
        hdr0, d0 = hdus[0]
        assert d0 is None
        assert hdr0["FOO"] == 1 and hdr0["BAR"] == "baz"
        assert hdr0["PI"] == 3.25 and hdr0["OK"] is True
        np.testing.assert_array_equal(hdus[1][1], f32)
        assert hdus[1][0]["EXTNAME"] == "SCI"
        np.testing.assert_array_equal(hdus[2][1], i16)
        assert os.path.getsize(path) % 2880 == 0


def _make_reads(nr=4, s=32, seed=0):
    rng = np.random.RandomState(seed)
    reads = np.cumsum(rng.uniform(0, 100, (nr, s, s)).astype(np.float32), axis=0)
    times = np.array([0.0, 0.3, 10.3, 20.3])[:nr]
    return reads, times


def _primary(nr):
    return default_primary_header(
        targname="T", grism="G141", nsamp=nr - 1, samp_seq="SPARS10",
        subarray=32, expstart_mjd=56000.0, exptime_s=20.3, scan=True,
        scan_rate_pix_s=1.0)


@pytest.mark.parametrize("use_native", [False, True])
def test_ima_roundtrip(use_native):
    if use_native and not native_available():
        pytest.skip("native backend unavailable")
    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x_ima.fits")
        write_ima(path, reads, times, _primary(4), use_native=use_native)
        hdr, got, got_times = read_ima(path)
        np.testing.assert_array_equal(got, reads)
        np.testing.assert_allclose(got_times, times)
        assert hdr["NSAMP"] == 4 and hdr["FILTER"] == "G141"
        assert hdr["SCAN_TYP"] == "C"


def test_ima_reverse_order_and_extensions():
    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x_ima.fits")
        write_ima(path, reads, times, _primary(4), use_native=False)
        hdus = read_fits(path)
        # primary + 4 reads x (SCI, ERR, DQ, SAMP, TIME)
        assert len(hdus) == 1 + 4 * 5
        names = [h.get("EXTNAME") for h, _ in hdus[1:6]]
        assert names == ["SCI", "ERR", "DQ", "SAMP", "TIME"]
        # reverse time order: first SCI is the LAST read
        assert hdus[1][0]["SAMPNUM"] == 3
        np.testing.assert_array_equal(hdus[1][1], reads[-1])
        assert hdus[1 + 3 * 5][0]["SAMPNUM"] == 0


@pytest.mark.skipif(not native_available(), reason="native backend unavailable")
def test_native_matches_python_bytes():
    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        p_py = os.path.join(d, "py.fits")
        p_nat = os.path.join(d, "nat.fits")
        write_ima(p_py, reads, times, _primary(4), use_native=False,
                  gain=2.5, read_noise_e=20.0)
        write_ima(p_nat, reads, times, _primary(4), use_native=True,
                  gain=2.5, read_noise_e=20.0)
        a, b = read_fits(p_py), read_fits(p_nat)
        assert len(a) == len(b)
        for (ha, da), (hb, db) in zip(a, b):
            assert ha.get("EXTNAME") == hb.get("EXTNAME")
            if da is None:
                assert db is None
            elif ha.get("EXTNAME") == "ERR":
                np.testing.assert_allclose(da, db, rtol=1e-6)
            else:
                np.testing.assert_array_equal(da, db)


def test_cr_dq_planes_cumulative():
    from wayne_tpu.io.ima import cr_dq_planes, DQ_COSMIC_RAY
    cr_pos = np.zeros((3, 2, 4), np.int32)
    cr_pos[0, :, 0] = [5, 7]      # hit at (5,7) in interval 0
    cr_pos[2, :, 0] = [1, 2]      # hit at (1,2) in interval 2
    cr_count = np.array([1, 0, 1])
    dq = cr_dq_planes(cr_pos, cr_count, nr=4, s=16)
    assert dq[0].sum() == 0                       # zeroth read clean
    assert dq[1][5, 7] == DQ_COSMIC_RAY           # flagged from read 1 on
    assert dq[2][5, 7] == DQ_COSMIC_RAY and dq[2][1, 2] == 0
    assert dq[3][1, 2] == DQ_COSMIC_RAY and dq[3][5, 7] == DQ_COSMIC_RAY


def test_ima_with_dq_planes_roundtrip():
    from wayne_tpu.io.ima import DQ_COSMIC_RAY
    reads, times = _make_reads()
    dq = np.zeros(reads.shape, np.int16)
    dq[2:, 4, 9] = DQ_COSMIC_RAY
    with tempfile.TemporaryDirectory() as d:
        for native in (False, True):
            if native and not native_available():
                continue
            path = os.path.join(d, f"dq{native}.fits")
            write_ima(path, reads, times, _primary(4), dq=dq,
                      use_native=native)
            hdus = read_fits(path)
            dq_planes = {h["SAMPNUM"]: arr for h, arr in hdus[1:]
                         if h.get("EXTNAME") == "DQ"}
            assert dq_planes[3][4, 9] == DQ_COSMIC_RAY
            assert dq_planes[0][4, 9] == 0


def test_exposure_product_api():
    from wayne_tpu.exposure_product import Exposure
    import tempfile
    rng = np.random.RandomState(1)
    exp = Exposure(targname="X", grism="G141", samp_seq="SPARS10",
                   subarray=32, expstart_mjd=56000.0, scan=True,
                   scan_rate_pix_s=0.5)
    frame = np.zeros((32, 32), np.float32)
    exp.add_read(frame, 0.0)
    for k in range(1, 4):
        frame = frame + rng.uniform(0, 50, (32, 32)).astype(np.float32)
        exp.add_read(frame, 0.1 + 10.0 * k)
    assert exp.nsamp == 3
    with tempfile.TemporaryDirectory() as d:
        path = exp.generate_fits(os.path.join(d, "x_ima.fits"))
        hdr, reads, times = read_ima(path)
        assert hdr["NSAMP"] == 4 and reads.shape == (4, 32, 32)
    with pytest.raises(ValueError):
        exp.add_read(frame, 1.0)   # non-increasing time


def test_ima_e_per_s_units():
    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "rate.fits")
        write_ima(path, reads, times, _primary(4), units="e_per_s", gain=2.5)
        hdus = read_fits(path)
        assert hdus[0][0]["BUNIT"] == "ELECTRONS/S"
        sci = {h["SAMPNUM"]: a for h, a in hdus[1:] if h.get("EXTNAME") == "SCI"}
        np.testing.assert_allclose(sci[2], reads[2] * 2.5 / times[2], rtol=1e-5)
        np.testing.assert_allclose(sci[0], 0.0)   # zeroth read has no rate
        # real ima files declare units per SCI EXTENSION too — a reader
        # keying off the extension header must not see raw-DN COUNTS
        # on rate planes (regression)
        for h, _ in hdus[1:]:
            if h.get("EXTNAME") == "SCI":
                assert h["BUNIT"] == "ELECTRONS/S", h
    with pytest.raises(ValueError):
        write_ima("/tmp/x.fits", reads, times, _primary(4), units="adu")


def test_fits_standard_details():
    """Standard-compliance details strict validators check: data blocks
    are ZERO-padded (headers space-padded), the primary header carries
    EXTEND=T when extensions follow, long/unicode string values cannot
    corrupt a card, and TIME-OBS never reads ':60.000' (regressions)."""
    from wayne_tpu.io.fits import card
    from wayne_tpu.io.ima import default_primary_header

    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pad.fits")
        write_ima(path, reads, times, _primary(4), use_native=False)
        raw = open(path, "rb").read()
        assert len(raw) % 2880 == 0
        hdus = read_fits(path)
        assert hdus[0][0].get("EXTEND") is True
        # locate the first SCI data block and check its padding bytes
        n = reads[0].size * 4
        hdr_end = raw.index(b"XTENSION")          # first extension header
        # walk blocks: find the block holding data by parsing via reader
        # instead — simpler: every byte of padding after the LAST data
        # block must be zero (file ends with a padded TIME plane)
        tail = raw[-((-n) % 2880):] if n % 2880 else b""
        assert all(b == 0 for b in tail), "data padding must be zeros"
        assert hdr_end > 0

    # long string value: the card stays 80 bytes with a closing quote
    c = card("TARGNAME", "A" * 120)
    assert len(c) == 80 and c.rstrip().endswith(b"'")
    # unicode values are sanitised, not a UnicodeEncodeError mid-write
    c2 = card("TARGNAME", "β Pic b")
    assert len(c2) == 80
    # a start time whose seconds round to 60.000 carries into the minute
    mjd = 56000.0 + (3 * 3600 + 59 * 60 + 59.99997) / 86400.0
    hdr = default_primary_header(
        targname="t", grism="G141", nsamp=3, samp_seq="RAPID",
        subarray=64, expstart_mjd=mjd, exptime_s=10.0, scan=False,
        scan_rate_pix_s=0.0)
    hh, mm, ss = hdr["TIME-OBS"].split(":")
    assert float(ss) < 60.0, hdr["TIME-OBS"]


def test_saturation_dq_flagging():
    from wayne_tpu.io.ima import DQ_COSMIC_RAY, DQ_SATURATED, saturation_dq
    reads = np.zeros((3, 8, 8), np.float32)
    fw, nl, gain = 78000.0, 0.04, 2.5
    ceiling = fw * (1 - nl) / gain
    reads[2, 4, 4] = ceiling            # saturated in last read only
    reads[1, 2, 2] = 0.5 * ceiling      # not saturated
    dq0 = np.zeros(reads.shape, np.int16)
    dq0[1, 2, 2] = DQ_COSMIC_RAY        # pre-existing CR flag survives
    dq = saturation_dq(reads, gain, fw, nl, dq0)
    assert dq[2, 4, 4] == DQ_SATURATED
    assert dq[1, 4, 4] == 0 and dq[1, 2, 2] == DQ_COSMIC_RAY
    assert dq[1, 2, 2] & DQ_SATURATED == 0


# WFC3 keyword checklist the reduction pipelines key off (SURVEY.md §3.5):
# every keyword must be present with the right type in each written ima.
_HEADER_CHECKLIST = [
    ("TELESCOP", str), ("INSTRUME", str), ("DETECTOR", str), ("FILTER", str),
    ("TARGNAME", str), ("DATE-OBS", str), ("TIME-OBS", str), ("ROOTNAME", str),
    ("IMAGETYP", str), ("OBSTYPE", str), ("OBSMODE", str),
    ("EXPSTART", float), ("EXPEND", float), ("EXPTIME", float),
    ("NSAMP", int), ("SAMP_SEQ", str), ("SUBARRAY", bool), ("SUBTYPE", str),
    ("APERTURE", str), ("SCAN_TYP", str), ("SCAN_RAT", float),
    ("SCAN_LEN", float), ("SCAN_ANG", float),
    ("POSTARG1", float), ("POSTARG2", float), ("PROPOSID", int),
    ("UNITCORR", str), ("BUNIT", str), ("ORIGIN", str),
]


def test_header_checklist_strict():
    reads, times = _make_reads()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x_ima.fits")
        write_ima(path, reads, times, _primary(4))
        hdr, _, _ = read_ima(path)
    for key, typ in _HEADER_CHECKLIST:
        assert key in hdr, f"missing WFC3 keyword {key}"
        if typ is float:
            assert isinstance(hdr[key], (int, float)) and not isinstance(
                hdr[key], bool), key
        else:
            assert isinstance(hdr[key], typ), (key, type(hdr[key]))
    assert hdr["OBSMODE"] == "MULTIACCUM"
    assert hdr["SUBTYPE"] == "SQ32SUB" and hdr["APERTURE"] == "IRSUB32"
    # MJD 56000 -> 2012-03-14
    assert hdr["DATE-OBS"] == "2012-03-14"


def test_static_dq_plane_hot_and_reference_pixels():
    from wayne_tpu.io.ima import DQ_HOT_PIXEL, DQ_REF_PIXEL, static_dq_plane
    dark = np.full((16, 16), 0.05)
    dark[3, 4] = 2.0                       # hot (20-200x nominal)
    active = np.ones((16, 16))
    active[0, :] = 0.0                     # reference-pixel row
    dq = static_dq_plane(dark, active)
    assert dq[3, 4] == DQ_HOT_PIXEL
    assert dq[0, 5] == DQ_REF_PIXEL
    assert dq[8, 8] == 0
    assert dq.dtype == np.int16


def test_hot_pixels_flagged_in_written_visit():
    """Hot pixels planted by the synthetic calibration carry DQ bit 16 in
    every read of the written product (VERDICT round-1 weak #6)."""
    import jax

    from wayne_tpu.config import config_from_dict
    from wayne_tpu.io.ima import DQ_HOT_PIXEL
    from wayne_tpu.observation import Observation

    cfg = config_from_dict({"grism": "G141", "subarray": 128, "NSAMP": 3,
                            "SAMPSEQ": "SPARS10", "scan": True,
                            "num_orbits": 1, "exposures_per_orbit": 1,
                            "n_lambda": 64, "n_sub": 4})
    obs = Observation(cfg)
    hot = np.asarray(obs.tables.dark_map) > 0.4
    assert hot.sum() > 0                   # calibration plants some
    with tempfile.TemporaryDirectory() as d:
        paths = obs.generate(d, chunk=1, progress=lambda s: None)
        hdus = read_fits(paths[0])
    dqs = [a for h, a in hdus[1:] if h.get("EXTNAME") == "DQ"]
    assert len(dqs) == 4
    for dq in dqs:                          # static mask: every read
        got = (dq & DQ_HOT_PIXEL) > 0
        np.testing.assert_array_equal(got, hot)


@pytest.mark.parametrize("use_native", [False, True])
def test_err_excludes_bias_includes_background(use_native):
    """ERR's shot term covers the measured charge above the bias pedestal
    (source+sky+dark) and excludes the non-Poissonian pedestal."""
    if use_native and not native_available():
        pytest.skip("native backend unavailable")
    gain, rn, bias_e = 2.5, 12.0, 1000.0
    nr, s = 3, 16
    reads = np.full((nr, s, s), bias_e / gain, np.float32)
    reads[2] += 4000.0 / gain             # 4000 e- of accumulated charge
    times = np.array([0.0, 0.3, 10.3])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "b_ima.fits")
        write_ima(path, reads, times, _primary(nr), gain=gain,
                  read_noise_e=rn, bias_pedestal_e=bias_e,
                  use_native=use_native)
        hdus = read_fits(path)
    errs = {h["SAMPNUM"]: a for h, a in hdus[1:] if h.get("EXTNAME") == "ERR"}
    # bias-only read: ERR = rn/gain exactly (no false shot term)
    np.testing.assert_allclose(errs[0], rn / gain, rtol=1e-5)
    # charged read: ERR = sqrt(4000 + rn^2)/gain
    np.testing.assert_allclose(errs[2], np.sqrt(4000.0 + rn**2) / gain,
                               rtol=1e-5)


@pytest.mark.parametrize("use_native", [False, True])
def test_err_uses_gain_and_bias_maps_exactly(use_native):
    """write_ima(gain_map=..., bias_e_map=...) propagates the per-pixel
    planes through ERR identically in the Python and C++ backends."""
    if use_native and not native_available():
        pytest.skip("native backend unavailable")
    rng = np.random.RandomState(1)
    nr, s, rn = 3, 16, 12.0
    gmap = (2.5 * (1.0 + 0.1 * rng.standard_normal((s, s)))).astype(np.float32)
    bmap = (2500.0 * (1.0 + 0.2 * rng.standard_normal((s, s)))
            ).astype(np.float32)
    reads = (bmap / gmap)[None] + rng.uniform(
        0, 4000, (nr, s, s)).astype(np.float32) / gmap[None]
    times = np.array([0.0, 0.3, 10.3])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "g_ima.fits")
        write_ima(path, reads, times, _primary(nr), gain=2.5,
                  read_noise_e=rn, bias_pedestal_e=2500.0,
                  gain_map=gmap, bias_e_map=bmap, use_native=use_native)
        hdus = read_fits(path)
    planes = {(h["EXTNAME"], h["SAMPNUM"]): a for h, a in hdus[1:]
              if h.get("EXTNAME") in ("SCI", "ERR")}
    for k in range(nr):
        sci = planes[("SCI", k)]
        want = np.sqrt(np.maximum(sci * gmap - bmap, 0.0) + rn**2) / gmap
        np.testing.assert_allclose(planes[("ERR", k)], want, rtol=2e-5)


def test_err_matches_empirical_rms_with_gain_variations():
    """Statistical ERR fidelity WITH gain_variations on: the per-pixel
    gain-map ERR model matches the empirical per-pixel read RMS in every
    detector quadrant; the scalar-gain model (round-2 behaviour) shows
    the quadrant gain structure leaking into the ratio."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.scene import example_scene

    S, NL, N = 64, 32, 96
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        bias=True, gain_variations=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=2,
                         samp_seq="RAPID", scan=True, max_cr_per_read=4,
                         transit_quad=16)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="RAPID", nsamp=2)
    # exaggerated quadrant gains (+-10%) so the statistical gate is
    # decisive at N=96 realisations (real WFC3 structure is ~1%)
    q = np.ones((S, S), np.float32)
    q[: S // 2, : S // 2] = 0.9
    q[S // 2:, S // 2:] = 1.1
    gmap = 2.5 * q
    tables = dataclasses.replace(tables, gain_map=jnp.asarray(gmap))
    scene = example_scene(NL, scan_speed=1.0)
    scene = dataclasses.replace(scene, x_ref=jnp.float32(15.0),
                                y_ref=jnp.float32(20.0))
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(11), i))(jnp.arange(N))

    def one(k):
        return simulate_exposure(
            dataclasses.replace(scene, key=k), tables, cfg).reads_dn[-1]

    last = np.asarray(jax.lax.map(one, keys))       # (N, S, S) final reads
    emp = last.std(axis=0, ddof=1)
    mean_sci = last.mean(axis=0)
    rn = float(tables.read_noise_e)
    bmap = np.asarray(tables.bias_map)
    err_maps = np.sqrt(np.maximum(mean_sci * gmap - bmap, 0) + rn**2) / gmap
    err_scalar = np.sqrt(
        np.maximum(mean_sci * 2.5 - bmap.mean(), 0) + rn**2) / 2.5

    def quadrant_ratios(model):
        h = S // 2
        return np.array([
            (emp[i: i + h, j: j + h] / model[i: i + h, j: j + h]).mean()
            for i in (0, h) for j in (0, h)])

    r_maps = quadrant_ratios(err_maps)
    r_scalar = quadrant_ratios(err_scalar)
    # map-aware model: every quadrant consistent with the empirical RMS
    assert np.abs(r_maps - 1.0).max() < 0.03, r_maps
    # scalar model: the +-10% gain quadrants leak into the ratio
    assert np.abs(r_scalar - 1.0).max() > 2.5 * np.abs(r_maps - 1.0).max(), (
        r_maps, r_scalar)
