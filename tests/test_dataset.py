"""Dataset generation: parameter sweeps, chunked resume, label round-trip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.parallel.dataset import generate_dataset, load_dataset, sweep_scenes
from wayne_tpu.parallel.mesh import make_mesh
from wayne_tpu.scene import example_scene

S, NL = 64, 32
CFG = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=2,
                     samp_seq="RAPID", scan=True, max_cr_per_read=4,
                     transit_quad=16, band_px=32)
TABLES = synthetic_tables("G141", subarray=S, n_lambda=NL, samp_seq="RAPID",
                          nsamp=2)


def _visit(n_exp=4):
    base = example_scene(NL, scan_speed=1.0)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)


class TestSweep:
    def test_override_broadcast_over_exposures(self):
        rp = jnp.linspace(0.1, 0.2, 6)[:, None] * jnp.ones((6, NL))
        ens = sweep_scenes(_visit(), 6, overrides={"rp_over_rs": rp})
        got = np.asarray(ens.rp_over_rs)
        assert got.shape == (6, 4, NL)
        np.testing.assert_allclose(got[3, 2], np.asarray(rp[3]))

    def test_override_scalar_field(self):
        speeds = jnp.array([0.5, 1.0, 1.5, 2.0])
        ens = sweep_scenes(_visit(), 4, overrides={"scan_speed": speeds})
        np.testing.assert_allclose(np.asarray(ens.scan_speed)[:, 0],
                                   np.asarray(speeds))

    def test_bad_override_shape_raises(self):
        with pytest.raises(ValueError):
            sweep_scenes(_visit(), 4, overrides={"scan_speed": jnp.ones(3)})


class TestGenerateDataset:
    def test_chunked_write_resume_and_load(self):
        mesh = make_mesh(jax.devices()[:2])
        rp_scale = np.linspace(0.9, 1.1, 8)
        overrides = {"scan_speed": jnp.full((8,), 1.0)}
        with tempfile.TemporaryDirectory() as d:
            log = []
            m = generate_dataset(_visit(), TABLES, CFG, d, n_mc=8,
                                 chunk_mc=4, overrides=overrides,
                                 labels={"rp_scale": rp_scale}, mesh=mesh,
                                 progress=log.append)
            assert len(m["chunks"]) == 2
            # resume: second call skips all chunks
            log2 = []
            generate_dataset(_visit(), TABLES, CFG, d, n_mc=8, chunk_mc=4,
                             overrides=overrides,
                             labels={"rp_scale": rp_scale}, mesh=mesh,
                             progress=log2.append)
            assert all("skipping" in s for s in log2)
            data = load_dataset(d)
            assert data["spectra_e"].shape == (8, 4, S)
            np.testing.assert_allclose(data["label_rp_scale"], rp_scale)
            assert np.isfinite(data["spectra_e"]).all()

    def test_chunk_size_invariance(self):
        """Realisation i is keyed by its GLOBAL index: runs chunked 2
        and 4 produce bit-identical spectra per realisation (the round-2
        keying folded the chunk start into the seed, so re-chunking
        changed every realisation past the first chunk — regression)."""
        mesh = make_mesh(jax.devices()[:2])
        with tempfile.TemporaryDirectory() as d2, \
                tempfile.TemporaryDirectory() as d4:
            generate_dataset(_visit(), TABLES, CFG, d2, n_mc=8, chunk_mc=2,
                             mesh=mesh)
            generate_dataset(_visit(), TABLES, CFG, d4, n_mc=8, chunk_mc=4,
                             mesh=mesh)
            a = load_dataset(d2)["spectra_e"]
            b = load_dataset(d4)["spectra_e"]
            np.testing.assert_array_equal(a, b)

    def test_validation_errors(self):
        mesh = make_mesh(jax.devices()[:2])
        with tempfile.TemporaryDirectory() as d:
            with pytest.raises(ValueError):
                generate_dataset(_visit(), TABLES, CFG, d, n_mc=6,
                                 chunk_mc=4, mesh=mesh)

    def test_resume_mismatch_raises(self):
        """Resuming with settings that change what the chunks hold
        (recover labels, seed, chunking) must fail loudly: silently
        skipped stale chunks would misalign every concatenated row
        after load_dataset (regression)."""
        mesh = make_mesh(jax.devices()[:2])
        visit = _visit()
        recover = {"exp_mid_s": jnp.zeros(4), "orbit": jax.tree_util.tree_map(
                       lambda x: x[0], visit.orbit),
                   "ld": visit.ld[0], "rp0": 0.15, "x_window": (10, 50),
                   "n_chan": 2}
        with tempfile.TemporaryDirectory() as d:
            generate_dataset(visit, TABLES, CFG, d, n_mc=4, chunk_mc=2,
                             mesh=mesh)
            # turning recover ON over chunks generated without it
            with pytest.raises(ValueError, match="resume mismatch"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=4,
                                 chunk_mc=2, mesh=mesh, recover=recover)
            # different seed / chunking over the same outdir
            with pytest.raises(ValueError, match="resume mismatch"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=4,
                                 chunk_mc=2, seed=99, mesh=mesh)
            with pytest.raises(ValueError, match="resume mismatch"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=4,
                                 chunk_mc=4, mesh=mesh)
        # n_chan < 1 is rejected up front
        with tempfile.TemporaryDirectory() as d:
            with pytest.raises(ValueError, match="n_chan"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=4,
                                 chunk_mc=2, mesh=mesh,
                                 recover={**recover, "n_chan": 0})

    def test_resume_nlincorr_convention_mismatch(self):
        """Chunks written with NLINCORR-linearized electrons must not be
        resumed by a raw-DN run (and vice versa) — the concatenated
        spectra would silently mix unit conventions. Pre-NLINCORR
        manifests (no key) count as raw DN."""
        import dataclasses as _dc
        import json

        mesh = make_mesh(jax.devices()[:2])
        visit = _visit()
        cfg_dn = _dc.replace(
            CFG, noise=_dc.replace(CFG.noise, non_linearity=False))
        with tempfile.TemporaryDirectory() as d:
            generate_dataset(visit, TABLES, CFG, d, n_mc=4, chunk_mc=2,
                             mesh=mesh)
            with pytest.raises(ValueError, match="nlincorr"):
                generate_dataset(visit, TABLES, cfg_dn, d, n_mc=4,
                                 chunk_mc=2, mesh=mesh)
            # legacy manifest without the key = raw-DN convention
            mpath = os.path.join(d, "manifest.json")
            with open(mpath) as fh:
                m = json.load(fh)
            m.pop("nlincorr")
            with open(mpath, "w") as fh:
                json.dump(m, fh)
            with pytest.raises(ValueError, match="nlincorr"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=4,
                                 chunk_mc=2, mesh=mesh)

    def test_resume_content_checks(self):
        """Per-chunk input fingerprints: GROWING a dataset (same seed,
        labels extending the old run's as a prefix) resumes cleanly;
        EDITED label content for an already-written chunk is rejected;
        a short label array is rejected up front; a truncated chunk
        file is regenerated instead of crashing the resume."""
        mesh = make_mesh(jax.devices()[:2])
        visit = _visit()
        rp = np.linspace(0.9, 1.1, 8)
        with tempfile.TemporaryDirectory() as d:
            generate_dataset(visit, TABLES, CFG, d, n_mc=4, chunk_mc=2,
                             labels={"rp_scale": rp[:4]}, mesh=mesh)
            # short labels vs n_mc: loud error, not silent truncation
            with pytest.raises(ValueError, match="rows"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=8, chunk_mc=2,
                                 labels={"rp_scale": rp[:6]}, mesh=mesh)
            # growth: first 2 chunks skipped, 2 new ones written
            log = []
            generate_dataset(visit, TABLES, CFG, d, n_mc=8, chunk_mc=2,
                             labels={"rp_scale": rp}, mesh=mesh,
                             progress=log.append)
            assert sum("skip" in s for s in log) == 2
            ds = load_dataset(d)
            np.testing.assert_allclose(ds["label_rp_scale"], rp)
            # edited content for chunk 0: rejected by fingerprint
            bad = rp.copy()
            bad[0] += 0.05
            with pytest.raises(ValueError, match="content differs"):
                generate_dataset(visit, TABLES, CFG, d, n_mc=8, chunk_mc=2,
                                 labels={"rp_scale": bad}, mesh=mesh)
            # truncated chunk file (pre-atomic-write crash artifact):
            # regenerated, and the dataset still loads identically
            chunk0 = os.path.join(d, "chunk_0000.npz")
            with open(chunk0, "r+b") as fh:
                fh.truncate(100)
            log2 = []
            generate_dataset(visit, TABLES, CFG, d, n_mc=8, chunk_mc=2,
                             labels={"rp_scale": rp}, mesh=mesh,
                             progress=log2.append)
            assert any("regenerating" in s for s in log2)
            ds2 = load_dataset(d)
            np.testing.assert_allclose(ds2["spectra_e"], ds["spectra_e"])


class TestTorchAdapter:
    def test_dataset_and_dataloader(self):
        from wayne_tpu.parallel.torch_data import WayneSpectraDataset
        mesh = make_mesh(jax.devices()[:2])
        rp_scale = np.linspace(0.9, 1.1, 8)
        with tempfile.TemporaryDirectory() as d:
            generate_dataset(_visit(), TABLES, CFG, d, n_mc=8, chunk_mc=4,
                             labels={"rp_scale": rp_scale}, mesh=mesh)
            ds = WayneSpectraDataset(d)
            assert len(ds) == 8
            spectra, labels = ds[5]
            assert spectra.shape == (4, S) and spectra.dtype == np.float32
            np.testing.assert_allclose(labels["rp_scale"], rp_scale[5])
            with pytest.raises(IndexError):
                ds[8]
            # torch collation end-to-end
            import torch
            from torch.utils.data import DataLoader
            tds = WayneSpectraDataset(d, as_torch=True)
            batch = next(iter(DataLoader(tds, batch_size=4)))
            xb, yb = batch
            assert xb.shape == (4, 4, S)
            assert yb["rp_scale"].shape == (4,)


class TestEclipseSweep:
    def test_fp_override_changes_spectra(self):
        """Sweeping fp_over_fs (eclipse-depth labels for emission
        retrieval datasets) flows through the ensemble: out-of-eclipse
        brightness scales with the per-realisation contrast."""
        import dataclasses

        from wayne_tpu.parallel.ensemble import simulate_ensemble_spectra
        from wayne_tpu.parallel.mesh import shard_scenes

        cfg = dataclasses.replace(CFG, noise=NoiseFlags.none(), eclipse=True)
        visit = _visit()
        # park every exposure at quadrature: planet fully visible
        q = 0.25 * float(visit.orbit.period_s[0]) + float(visit.orbit.t0_s[0])
        visit = dataclasses.replace(
            visit, exp_start_s=jnp.full((4,), q, jnp.float32),
            x_ref=jnp.full((4,), 20.0, jnp.float32),
            y_ref=jnp.full((4,), 30.0, jnp.float32))
        fp = np.array([0.0, 5e-3], np.float32)
        ens = sweep_scenes(visit, 2, overrides={
            "fp_over_fs": np.broadcast_to(fp[:, None], (2, NL)).copy()})
        mesh = make_mesh(jax.devices()[:1])
        spectra = np.asarray(simulate_ensemble_spectra(
            shard_scenes(ens, mesh), TABLES, cfg, mesh))
        tot = spectra.sum(axis=(1, 2))
        np.testing.assert_allclose(tot[1] / tot[0], 1.005, atol=2e-4)


class TestRecoveredLabels:
    @pytest.mark.slow
    def test_recovered_depths_track_injected_sweep(self):
        """generate_dataset(recover=...) attaches on-device fitted
        depths per realisation that track the swept injection. Needs a
        science-scale fixture (the module-level 64^2 one keeps the
        trace off-detector on purpose — plumbing tests only)."""
        import dataclasses

        S2, NL2, n_exp, n_mc = 128, 64, 16, 4
        cfg = ExposureStatic(
            subarray=S2, n_lambda=NL2, n_sub=2, nsamp=3,
            samp_seq="SPARS10", scan=True, band_px=48,
            transit_quad=16,
            noise=dataclasses.replace(NoiseFlags.none(), poisson=True,
                                      read_noise=True))
        tables = synthetic_tables("G141", subarray=S2, n_lambda=NL2,
                                  samp_seq="SPARS10", nsamp=3)
        base = example_scene(NL2, scan_speed=1.0)
        base = dataclasses.replace(base, x_ref=jnp.float32(30.0),
                                   y_ref=jnp.float32(30.0))
        starts = np.linspace(0.0, 4.0 * 3600.0, n_exp).astype(np.float32)
        visit = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
        visit = dataclasses.replace(visit, exp_start_s=jnp.asarray(starts))
        exptime = float(tables.read_times[-1])
        mid = jnp.asarray(starts + exptime / 2.0)

        rp_inj = np.linspace(0.13, 0.18, n_mc).astype(np.float32)
        overrides = {"rp_over_rs": jnp.asarray(rp_inj)[:, None]
                     * jnp.ones((n_mc, NL2), jnp.float32)}
        recover = {"exp_mid_s": mid, "orbit": base.orbit, "ld": base.ld,
                   "rp0": 0.15, "x_window": (72, 126), "n_chan": 3}
        with tempfile.TemporaryDirectory() as d:
            m = generate_dataset(visit, tables, cfg, d, n_mc=n_mc,
                                 chunk_mc=2, overrides=overrides,
                                 labels={"rp": rp_inj}, recover=recover)
            assert m["recovered"] is True
            data = load_dataset(d)
            # the torch adapter exposes recovered labels per item
            from wayne_tpu.parallel.torch_data import WayneSpectraDataset
            _, lab = WayneSpectraDataset(d)[1]
            np.testing.assert_allclose(lab["recovered_rp"],
                                       data["recovered_rp"][1])
            assert lab["recovered_rp_sigma"].shape == (3,)
        assert data["recovered_rp"].shape == (n_mc, 3)
        assert np.all(data["recovered_rp_sigma"] > 0)
        # each realisation's fitted depths track ITS injected radius
        err = np.abs(data["recovered_rp"]
                     - data["label_rp"][:, None])
        tol = np.maximum(6.0 * data["recovered_rp_sigma"], 0.01)
        assert np.all(err < tol), (data["recovered_rp"], rp_inj)
        # and the sweep ordering survives recovery
        means = data["recovered_rp"].mean(axis=1)
        assert np.all(np.diff(means) > 0), means


@pytest.mark.slow
def test_spectra_to_depths_subtract_bg_removes_dilution():
    """Ensemble spectra are FULL-FRAME column sums: unsubtracted sky
    background B dilutes the normalised dip by F/(F+B), biasing depths
    low. subtract_bg=True estimates B per exposure from the off-trace
    columns (median) and restores the injected depth (regression: the
    recover labels shipped diluted whenever sky was on)."""
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve
    from wayne_tpu.reduction import spectra_to_depths
    from wayne_tpu.scene import example_scene

    base = example_scene(32)
    orbit = base.orbit
    ld = base.ld
    rp_true = 0.15
    t0 = float(orbit.t0_s)
    t = jnp.asarray(np.linspace(t0 - 3.0 * 3600, t0 + 3.0 * 3600, 48),
                    jnp.float32)
    z, infr = projected_separation(t, orbit)
    f = transit_depth_curve(z, jnp.float32(rp_true), ld, 32)
    lc = 1.0 - (1.0 - f) * infr                            # (48,)
    S, lo, hi = 64, 16, 48
    F0, B = 3.2e5, 5e3                                     # e-/col: B/F ~ 0.5
    spectra = np.full((48, S), B, np.float32)
    spectra[:, lo:hi] += (F0 / (hi - lo)) * np.asarray(lc)[:, None]
    kw = dict(x_window=(lo, hi), n_chan=4, divide_white=False)
    rp_raw, _ = spectra_to_depths(spectra, t, orbit, ld, rp_true, **kw)
    rp_fix, _ = spectra_to_depths(spectra, t, orbit, ld, rp_true,
                                  subtract_bg=True, **kw)
    # diluted: rp ~ rp_true * sqrt(F/(F+B_win)); corrected: exact
    assert np.all(np.asarray(rp_raw) < rp_true - 0.01), rp_raw
    np.testing.assert_allclose(np.asarray(rp_fix), rp_true, atol=1e-3)


def test_spectra_to_depths_scan_dir_removes_offset():
    """Forward/reverse alternating visits carry an achromatic
    upstream/downstream flux offset (trends.reverse_flux_offset).
    scan_dir normalises each direction by its own out-of-transit
    baseline: without it the sawtooth inflates the fit residuals and
    biases depths; with it the injected depth comes back exactly."""
    from wayne_tpu.ops.kepler import projected_separation
    from wayne_tpu.ops.transit import transit_depth_curve
    from wayne_tpu.reduction import spectra_to_depths
    from wayne_tpu.scene import example_scene

    base = example_scene(32)
    orbit = base.orbit
    ld = base.ld
    rp_true = 0.15
    t0 = float(orbit.t0_s)
    n_exp = 48
    t = jnp.asarray(np.linspace(t0 - 3.0 * 3600, t0 + 3.0 * 3600, n_exp),
                    jnp.float32)
    z, infr = projected_separation(t, orbit)
    f = transit_depth_curve(z, jnp.float32(rp_true), ld, 32)
    lc = 1.0 - (1.0 - f) * infr
    S2, lo, hi = 64, 16, 48
    rev = (np.arange(n_exp) % 2 == 1)
    off = np.where(rev, 1.01, 1.0).astype(np.float32)       # +1% reverse
    spectra = np.zeros((n_exp, S2), np.float32)
    spectra[:, lo:hi] = (3.2e5 / (hi - lo)) * (off * np.asarray(lc))[:, None]
    kw = dict(x_window=(lo, hi), n_chan=4, divide_white=False)
    rp_raw, sig_raw = spectra_to_depths(spectra, t, orbit, ld, rp_true, **kw)
    rp_fix, sig_fix = spectra_to_depths(
        spectra, t, orbit, ld, rp_true,
        scan_dir=jnp.asarray(rev, jnp.float32), **kw)
    np.testing.assert_allclose(np.asarray(rp_fix), rp_true, atol=2e-4)
    # uncorrected: the 1% sawtooth is ~25x the fit's own residual floor
    assert np.all(np.asarray(sig_raw) > 5.0 * np.asarray(sig_fix)), (
        sig_raw, sig_fix)


def test_scan_direction_factor_guards():
    """<2 out-of-transit exposures in either direction degrades the
    correction to exactly 1 (no spurious normalisation)."""
    from wayne_tpu.reduction import scan_direction_factor

    white = jnp.asarray([1.0, 1.01, 1.0, 1.01], jnp.float32)
    rev = jnp.asarray([0.0, 1.0, 0.0, 1.0], jnp.float32)
    # both directions have 2 OOT members -> exact factor
    corr = scan_direction_factor(white, jnp.ones(4), rev)
    np.testing.assert_allclose(np.asarray(corr),
                               [1.0, 1.01, 1.0, 1.01], rtol=1e-6)
    # only one reverse exposure out of transit -> no correction
    oot = jnp.asarray([1.0, 1.0, 1.0, 0.0], jnp.float32)
    corr = scan_direction_factor(white, oot, rev)
    np.testing.assert_allclose(np.asarray(corr), 1.0)


@pytest.mark.slow
def test_spectra_to_depths_matches_reduce_visit_path():
    """The dataset-QA fitter on reduce_visit's own extracted spectra
    reproduces the reduce_visit -> divide-white -> fit_depths chain
    exactly (same binning, normalisation and fits)."""
    import dataclasses

    from wayne_tpu.reduction import (divide_white_fit_depths,
                                     reduce_visit, spectra_to_depths)

    S2, NL2, n_exp = 128, 64, 16
    cfg = ExposureStatic(
        subarray=S2, n_lambda=NL2, n_sub=2, nsamp=3, samp_seq="SPARS10",
        scan=True, band_px=48, transit_quad=16,
        noise=dataclasses.replace(NoiseFlags.none(), poisson=True,
                                  read_noise=True))
    tables = synthetic_tables("G141", subarray=S2, n_lambda=NL2,
                              samp_seq="SPARS10", nsamp=3)
    base = example_scene(NL2, scan_speed=1.0)
    base = dataclasses.replace(base, x_ref=jnp.float32(30.0),
                               y_ref=jnp.float32(30.0))
    starts = np.linspace(0.0, 4.0 * 3600.0, n_exp).astype(np.float32)
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(2), i))(jnp.arange(n_exp))
    visit = dataclasses.replace(visit, exp_start_s=jnp.asarray(starts),
                                key=keys)
    from wayne_tpu.ops.visit import simulate_visit
    out = simulate_visit(visit, tables, cfg, chunk=8)
    mid = jnp.asarray(starts + float(tables.read_times[-1]) / 2.0)

    xw, n_chan = (72, 126), 3
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       y_window=(20, 75), x_window=xw,
                       bg_rows=(100, 126), n_chan=n_chan)
    # the divide-white chain including the white fit's common-mode
    # sigma in quadrature (reduction.divide_white_fit_depths) — what
    # spectra_to_depths(divide_white=True) runs internally
    rp_ref, sig_ref = divide_white_fit_depths(
        red.white_lc, red.channel_lc, mid, base.orbit, base.ld,
        jnp.float32(0.15))
    rp_qa, sig_qa = spectra_to_depths(red.spectra_e, mid, base.orbit,
                                      base.ld, 0.15, x_window=xw,
                                      n_chan=n_chan)
    np.testing.assert_allclose(np.asarray(rp_qa), np.asarray(rp_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(sig_qa), np.asarray(sig_ref),
                               rtol=1e-4)
