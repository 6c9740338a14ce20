"""DQ-aware reduction: the cosmic-ray loop closed end to end.

Real WFC3 pipelines consume the ima DQ planes and reject/repair
CR-hit pixels (SURVEY.md: flagged in DQ in real pipelines). These tests
cover the repair primitive (exact on clean stacks, removes injected CR
steps), the on-device mask construction (matches io.ima.cr_dq_planes),
and the closed loop: a CR-peppered visit reduces to correct depths both
in-memory (reduce_visit(good_diffs=...)) and from disk (run_reduce DQ path).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wayne_tpu.calibration import synthetic_tables
from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.io.ima import cr_dq_planes
from wayne_tpu.ops.visit import simulate_visit
from wayne_tpu.reduction import (
    DQ_BAD_BITS, cr_bad_diff_masks, fit_depths, good_diff_masks_from_dq,
    reduce_visit, repair_read_stack)
from wayne_tpu.scene import example_scene

S, NL, NSAMP = 128, 64, 4
N_EXP = 40


def test_repair_read_stack_identity_when_clean():
    rng = np.random.RandomState(0)
    reads = jnp.asarray(rng.uniform(0, 100, (5, 16, 16)), jnp.float32)
    good = jnp.ones((4, 16, 16), bool)
    out = repair_read_stack(reads, good)
    np.testing.assert_allclose(np.asarray(out), np.asarray(reads),
                               rtol=1e-6, atol=1e-4)


def test_repair_removes_cr_step():
    """A CR is a charge step: repair must restore the underlying ramp of
    the hit pixel from its same-interval column neighbours."""
    t = np.asarray([0.0, 1.0, 2.0, 3.0, 4.0], np.float32)
    rate = np.linspace(10.0, 12.0, 16)[None, :] * np.ones((16, 1))
    truth = rate[None] * t[:, None, None]           # (5, 16, 16) clean ramps
    hit = truth.copy()
    hit[3:, 8, 8] += 500.0                          # step during interval 2
    good = np.ones((4, 16, 16), bool)
    good[2, 8, 8] = False      # ONLY the transition interval is corrupted
    out = np.asarray(repair_read_stack(jnp.asarray(hit), jnp.asarray(good)))
    # the post-hit diff (interval 3) cancels the step and is reused
    # verbatim; the corrupted interval's estimate takes the neighbours'
    # temporal SHAPE rescaled to this pixel's own clean amplitude, so
    # the rebuilt ramp matches the truth to f32 rounding
    np.testing.assert_allclose(out[:, 8, 8], truth[:, 8, 8], atol=0.05)
    # everything unflagged is untouched
    mask = np.ones((16, 16), bool)
    mask[8, 8] = False
    np.testing.assert_allclose(out[:, mask], hit[:, mask], atol=1e-4)


def test_repair_hot_pixel_full_interpolation():
    """A pixel flagged in EVERY read (hot) becomes pure spatial
    interpolation of its neighbours' diffs."""
    t = np.arange(4, dtype=np.float32)
    truth = (5.0 * t)[:, None, None] * np.ones((1, 8, 8), np.float32)
    hot = truth.copy()
    hot[:, 4, 4] += 1e4                            # hot pedestal, all reads
    good = np.ones((3, 8, 8), bool)
    good[:, 4, 4] = False                          # every interval bad
    out = np.asarray(repair_read_stack(jnp.asarray(hot), jnp.asarray(good)))
    # CDS of the rebuilt hot pixel matches the neighbours' ramp
    assert abs((out[-1, 4, 4] - out[0, 4, 4]) - 15.0) < 1e-3


def test_cr_bad_diff_masks_matches_cr_dq_planes():
    """On-device interval masks agree with the file-level DQ route:
    the transition intervals of the cumulative DQ planes are exactly
    the hit intervals (no pixel is hit twice here)."""
    rng = np.random.RandomState(7)
    nsamp, max_cr, s = 4, 8, 32
    # distinct positions so the cumulative convention loses nothing
    flat = rng.choice(s * s, nsamp * max_cr, replace=False)
    cr_pos = np.stack([flat // s, flat % s]).reshape(2, nsamp, max_cr)
    cr_pos = np.ascontiguousarray(cr_pos.transpose(1, 0, 2)).astype(np.int32)
    cr_count = np.asarray([3, 0, 8, 1], np.int32)
    dq = cr_dq_planes(cr_pos, cr_count, nsamp + 1, s)
    bad = np.asarray(cr_bad_diff_masks(jnp.asarray(cr_pos),
                                       jnp.asarray(cr_count), s))
    from_dq = ~np.asarray(good_diff_masks_from_dq(jnp.asarray(dq)))
    np.testing.assert_array_equal(bad, from_dq)


def test_good_diff_masks_from_dq_bits():
    dq = np.zeros((3, 4, 4), np.int16)
    dq[1:, 0, 0] |= 8192        # CR hit in interval 0: reads 1.. flagged
    dq[2, 1, 1] = 256           # saturated in the last read only
    dq[:, 2, 2] = 16            # hot pixel: every read flagged
    dq[1, 3, 3] = 128           # reference pixel: NOT a bad bit
    dq[:, 0, 3] = 4             # dead pixel: static class, every read
    dq[:, 3, 0] = 512           # IR blob: static class, every read
    good = np.asarray(good_diff_masks_from_dq(jnp.asarray(dq)))
    # CR: only the transition interval is bad; the later diff cancels it
    assert not good[0, 0, 0] and good[1, 0, 0]
    # saturation invalidates any diff touching the saturated read
    assert good[0, 1, 1] and not good[1, 1, 1]
    # static classes (hot/dead/blob): everything bad
    assert not good[:, 2, 2].any()
    assert not good[:, 0, 3].any() and not good[:, 3, 0].any()
    # reference bit ignored
    assert good[:, 3, 3].all() and good[:, 0, 1].all()
    assert DQ_BAD_BITS == 8192 | 256 | 16 | 4 | 512 | 32


def _simulate_cr_visit(seed=0, boost=30.0):
    """A noisy visit peppered with cosmic rays at ``boost``x the nominal
    rate — strong enough that unrepaired depths are visibly corrupted."""
    flags = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, cosmic_rays=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=48, max_cr_per_read=256)
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=NSAMP)
    tables = dataclasses.replace(
        tables,
        cr_rate_px_s=jnp.float32(float(tables.cr_rate_px_s) * boost),
        cr_mean_e=jnp.float32(3e4))
    base = example_scene(NL, scan_speed=1.0)
    wl = np.asarray(tables.wl_centers)
    rp = 0.1595 + 0.004 * np.sin(10.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(30.0), y_ref=jnp.float32(30.0),
        rp_over_rs=jnp.asarray(rp, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    scenes = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    keys = jax.vmap(lambda i: jax.random.fold_in(
        jax.random.PRNGKey(seed), i))(jnp.arange(N_EXP))
    scenes = dataclasses.replace(
        scenes, exp_start_s=jnp.asarray(starts, jnp.float32), key=keys)
    out = simulate_visit(scenes, tables, cfg, chunk=8)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    return out, tables, base, mid, cfg


def test_reduce_visit_dq_aware_recovers_cr_peppered_depths():
    """The closed loop with cosmic rays ON: DQ-aware reduction recovers
    the injected depth; the naive reduction of the same frames is
    measurably worse (the CRs actually mattered)."""
    out, tables, base, mid, cfg = _simulate_cr_visit(seed=2)
    assert int(np.asarray(out.cr_count).sum()) > 1000   # actually peppered
    good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(p, c, S)
                    )(out.cr_pos, out.cr_count)
    kw = dict(y_window=(20, 75), x_window=(72, 126), bg_rows=(100, 126),
              n_chan=6)
    red = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit,
                       good_diffs=good, **kw)
    naive = reduce_visit(out.reads_dn, tables.gain, mid, base.orbit, **kw)
    rp_hat, rp_sig = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                                jnp.float32(0.15))
    rp_naive, _ = fit_depths(naive.channel_lc, mid, base.orbit, base.ld,
                             jnp.float32(0.15))
    rp_hat, rp_sig = np.asarray(rp_hat), np.asarray(rp_sig)
    tol = np.maximum(6.0 * rp_sig, 0.006)
    assert np.all(np.abs(rp_hat - 0.1595) < tol), (rp_hat, rp_sig)
    err_dq = np.abs(rp_hat - 0.1595).mean()
    err_naive = np.abs(np.asarray(rp_naive) - 0.1595).mean()
    assert err_dq < err_naive, (err_dq, err_naive)


def test_ensemble_extraction_is_dq_aware():
    """parallel/ensemble extracts CR-simulated visits with the repair:
    ensemble spectra with CRs on stay close to the CR-free spectra of
    the same realisation (same keys, so the only delta is CR+repair)."""
    from wayne_tpu.parallel.ensemble import mc_scenes, simulate_ensemble_spectra
    from wayne_tpu.parallel.mesh import make_mesh

    flags = dataclasses.replace(NoiseFlags.none(), cosmic_rays=True)
    cfg = ExposureStatic(subarray=64, n_lambda=32, n_sub=2, nsamp=3,
                         samp_seq="SPARS10", scan=True, noise=flags,
                         band_px=32, max_cr_per_read=64)
    tables = synthetic_tables("G141", subarray=64, n_lambda=32,
                              samp_seq="SPARS10", nsamp=3)
    tables = dataclasses.replace(
        tables, cr_rate_px_s=jnp.float32(float(tables.cr_rate_px_s) * 100),
        cr_mean_e=jnp.float32(5e4))
    base = example_scene(32, scan_speed=0.3)
    base = dataclasses.replace(base, x_ref=jnp.float32(8.0),
                               y_ref=jnp.float32(16.0))
    n_exp = 4
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_exp,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(
            np.linspace(0, 600.0, n_exp), jnp.float32))
    mesh = make_mesh(jax.devices()[:1])
    ens = mc_scenes(visit, 2, seed=0)
    with_cr = np.asarray(simulate_ensemble_spectra(ens, tables, cfg, mesh))
    cfg_off = dataclasses.replace(cfg, noise=NoiseFlags.none())
    no_cr = np.asarray(simulate_ensemble_spectra(ens, tables, cfg_off, mesh))
    # ~17% of pixels take a 5e4 e- hit somewhere in the ramp; unrepaired
    # column sums would be off by many thousands of electrons. Repaired
    # spectra agree with the CR-free truth to a tight absolute envelope.
    resid = np.abs(with_cr - no_cr)
    assert resid.max() < 0.02 * no_cr.max() + 50.0, resid.max()


@pytest.mark.slow
def test_run_reduce_cli_dq_repair(tmp_path):
    """File-level CR loop: a visit with strong cosmic rays reduces to
    the injected depth through the DQ planes; --no-dq on the same files
    is worse."""
    import json

    import yaml

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.run_reduce import main as reduce_main

    pars = {"grism": "G141", "subarray": 128, "NSAMP": 4,
            "SAMPSEQ": "SPARS10", "scan": True, "x_ref": 30.0,
            "y_ref": 40.0, "num_orbits": 3, "exposures_per_orbit": 6,
            "n_lambda": 64, "n_sub": 4, "rp_over_rs": 0.14,
            "start_mjd": 55999.93, "t0": 56000.0, "period": 0.813475,
            "sma_over_rs": 4.855, "inclination": 82.1, "seed": 3,
            # ~40x the real CR rate: every exposure takes many hits
            "cosmic_rate": 440.0}
    ppath = tmp_path / "pars.yml"
    ppath.write_text(yaml.safe_dump(pars))
    outdir = tmp_path / "visit"
    obs = Observation(load_yaml(str(ppath)))
    obs.generate(str(outdir), chunk=6, progress=lambda s: None)

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath),
                      "--n-chan", "4", "--cpu"])
    assert rc == 0
    rep = json.loads((outdir / "reduced.json").read_text())
    assert rep["dq_repair"] is True
    for c in rep["channels"]:
        assert abs(c["rp_over_rs"] - 0.14) < max(5 * c["rp_sigma"], 4e-3), c

    rc = reduce_main(["-d", str(outdir), "-p", str(ppath), "--n-chan", "4",
                      "--cpu", "--no-dq", "-o", str(outdir / "nodq.json")])
    assert rc == 0
    nodq = json.loads((outdir / "nodq.json").read_text())
    assert nodq["dq_repair"] is False
    # The repair changed the extraction (CRs were actually flagged and
    # rebuilt) and did not degrade the recovery. At the physical ~1000 e-
    # deposit the per-channel improvement is below one noise sigma for a
    # single visit — the decisive better-than-naive comparison runs at
    # 30x deposits in test_reduce_visit_dq_aware_recovers_cr_peppered_
    # depths; here the file-level loop must be lossless and wired.
    assert rep["channels"] != nodq["channels"]
    err_dq = np.mean([abs(c["rp_over_rs"] - 0.14)
                      for c in rep["channels"]])
    err_nodq = np.mean([abs(c["rp_over_rs"] - 0.14)
                        for c in nodq["channels"]])
    assert err_dq < err_nodq + 5e-4, (err_dq, err_nodq)


def test_column_repair_budget_covers_high_cr_rates():
    """The compacted hit budget in _cr_hit_deltas must sit far above
    the expected TOTAL hit count even at high per-interval rates
    (lam ~ 200: large subarrays x long read intervals). The earlier
    flat budget (H//2 + 3*MAX_CR) crossed the mean total near lam ~ 216
    and silently dropped valid hits — each dropped hit leaves a full
    ~700 e- CR step in the extracted spectrum (regression). Also the
    only test that exercises the compaction branch itself."""
    from wayne_tpu.reduction import extract_spectra_cr

    rng = np.random.RandomState(11)
    nsamp, s, lam = 8, 64, 200.0
    # auto_max_cr sizing: lam + 6 sqrt(lam) + 4, rounded up to x8
    need = lam + 6.0 * lam ** 0.5 + 4.0
    n_cr = int(-(-need // 8) * 8)
    H = nsamp * n_cr
    assert H // 2 + 3 * n_cr < H          # compaction branch is active
    rate = rng.uniform(5.0, 50.0, (s, s)).astype(np.float32)
    t = np.arange(nsamp + 1, dtype=np.float32)
    reads = (rate[None] * t[:, None, None]).copy()
    cr_pos = np.zeros((nsamp, 2, n_cr), np.int32)
    cr_count = np.minimum(rng.poisson(lam, nsamp), n_cr).astype(np.int32)
    for k in range(nsamp):
        ys = rng.randint(0, s, cr_count[k])
        xs = rng.randint(0, s, cr_count[k])
        cr_pos[k, 0, : cr_count[k]] = ys
        cr_pos[k, 1, : cr_count[k]] = xs
        for rr in range(k + 1, nsamp + 1):
            np.add.at(reads[rr], (ys, xs), 700.0)
    spec = np.asarray(extract_spectra_cr(jnp.asarray(reads),
                                         jnp.asarray(cr_pos),
                                         jnp.asarray(cr_count)))
    truth = (rate * (t[-1] - t[0])).sum(axis=0)            # clean CDS
    # ~1600 hits: every one must be repaired — one dropped hit alone
    # leaves a 700 e- column error; residuals here are neighbour-
    # estimate noise only (measured < 200 per column at this density)
    assert np.max(np.abs(spec - truth)) < 350.0, \
        np.max(np.abs(spec - truth))


def test_sparse_repair_matches_dense_on_isolated_hits():
    """repair_read_stack_sparse computes the identical correction to the
    dense repair when hit pixels' column neighbours are clean (the
    physical case) — and costs O(hits), which is why the ensemble path
    uses it (BENCH_MATRIX config 5 regression)."""
    from wayne_tpu.reduction import repair_read_stack_sparse

    rng = np.random.RandomState(3)
    nsamp, s, n_cr = 4, 32, 8
    # ramps with spatial structure + isolated hits (no adjacent columns)
    rate = rng.uniform(5.0, 50.0, (s, s)).astype(np.float32)
    t = np.arange(nsamp + 1, dtype=np.float32)
    reads = rate[None] * t[:, None, None]
    cr_pos = np.zeros((nsamp, 2, n_cr), np.int32)
    cr_count = np.asarray([2, 0, 3, 1], np.int32)
    hits = [(0, 5, 5), (0, 10, 20), (2, 5, 10), (2, 20, 8), (2, 28, 25),
            (3, 15, 15)]
    per_k = {0: [], 2: [], 3: []}
    for k, y, x in hits:
        per_k[k].append((y, x))
        reads[k + 1:, y, x] += 700.0          # the CR charge steps
    for k, lst in per_k.items():
        for i, (y, x) in enumerate(lst):
            cr_pos[k, 0, i], cr_pos[k, 1, i] = y, x
    reads_j = jnp.asarray(reads)
    pos_j, cnt_j = jnp.asarray(cr_pos), jnp.asarray(cr_count)
    sparse = np.asarray(repair_read_stack_sparse(reads_j, pos_j, cnt_j))
    dense = np.asarray(repair_read_stack(
        reads_j, ~cr_bad_diff_masks(pos_j, cnt_j, s)))
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-2)
    # and both recover the uncorrupted truth exactly here (linear ramps)
    truth = rate[None] * t[:, None, None]
    np.testing.assert_allclose(sparse, truth, rtol=1e-5, atol=0.5)
