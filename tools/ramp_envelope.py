#!/usr/bin/env python
"""Parametric ramp-fit model-mismatch envelope -> RAMP_ENVELOPE.json.

The Iraclis-style joint ramp fit (reduction.fit_white_ramp +
ramp_detrend) carries a model-mismatch bias (committed point: ~1.2e-3
white-depth bias at the validation defaults; round-3 verdict weak #6).
This sweep quantifies WHERE that bias comes from and how it scales, so
`--detrend ramp` has a documented validity domain:

- **The hook is NOT the source.** A first sweep over hook amplitude
  (0..4x default) x first-orbit strength (1..4x) moved the bias by
  < 2e-4 end to end — fit_white_ramp's separate first-orbit amplitude
  absorbs the exponential ramp essentially exactly. (That sweep also
  exposed that the result depends only on amp x orbit1_scale, i.e.
  on the one piece the model fits jointly.) Re-verified here via
  ``hook_absorption_max_delta``.
- **The sinusoidal SSV is absorbed too** (channel effect < 3e-5 at
  2x the default amplitude): its per-exposure mean factor is common
  to every exposure of a scan program with fixed phase, so the OOT
  normalisation removes it.
- **The random-walk SSV is the sole source.** Its draw-specific
  wiggles share no basis with the hook/slope template and alias into
  the depth as a PER-VISIT RANDOM ERROR, linear in amplitude: white
  per-draw std ~5e-3 at the default rw = 0.005 (mean over draws
  ~3e-4 — unbiased, but any ONE visit can land e-3s off), per-channel
  relative depths (the divide-by-white geometry suppresses the
  common part) mean-max ~0.8e-3 at 0.005 and ~1.7e-3 at 0.01. The
  committed validation point (~1.2e-3, one draw) is one sample of
  exactly this distribution.

Practical domain for `--detrend ramp`: fine when SSV is
sinusoid-dominated; with visible stochastic (draw-to-draw) SSV the
white depth carries a per-visit error ~1 e-3 per 1e-3 of rw amplitude
— prefer divide-white for the channels (it shares the white's common
error but the validated sigma accounts for it:
reduction.divide_white_fit_depths).

Gates: |mean bias| at the validation default (sin 0.015, rw 0.005)
stays < 2e-3, the per-channel bias grows with rw amplitude (the real
lever), sin amplitude moves the bias < 1e-4, and the hook-absorption
delta stays < 5e-4.

Usage: python tools/ramp_envelope.py [--cpu] [--n-draw 8]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--n-draw", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.reduction import (fit_depths, fit_white_ramp,
                                     ramp_detrend, reduce_visit)
    from wayne_tpu.scene import example_scene

    # the validation suite's visit, systematics on / stochastic off
    S, NL, NSAMP, N_EXP, N_CHAN = 256, 256, 5, 48, 8
    flags = dataclasses.replace(NoiseFlags.none(), ssv=True,
                                visit_trend=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS25", scan=True, noise=flags,
                         band_px=64,
                         use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS25", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=0.5)
    wl = np.asarray(tables.wl_centers)
    rp_inj = 0.1595 + 0.003 * np.sin(8.0 * wl)
    base = dataclasses.replace(
        base, x_ref=jnp.float32(40.0), y_ref=jnp.float32(60.0),
        rp_over_rs=jnp.asarray(rp_inj, jnp.float32))
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    visit0 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), base)
    visit0 = dataclasses.replace(
        visit0, exp_start_s=jnp.asarray(starts, jnp.float32))
    x_window, y_window, bg_rows = (104, 232), (40, 100), (180, 250)

    @jax.jit
    def run(sin_amp, rw_amp, hook_amp, orbit1_scale, draw):
        # amplitudes + draw index are traced: the whole sweep reuses
        # ONE compiled program (CLAUDE.md architecture invariant)
        def bfill(v, like):
            return jnp.broadcast_to(jnp.float32(v), like.shape)

        trends = dataclasses.replace(
            visit0.trends,
            ssv_amp=bfill(sin_amp, visit0.trends.ssv_amp),
            ssv_rw_amp=bfill(rw_amp, visit0.trends.ssv_rw_amp),
            hook_amp=bfill(hook_amp, visit0.trends.hook_amp),
            hook_orbit1_scale=bfill(orbit1_scale,
                                    visit0.trends.hook_orbit1_scale))
        scenes = dataclasses.replace(
            visit0, trends=trends,
            key=jax.vmap(lambda e: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(123), draw), e)
            )(jnp.arange(N_EXP)))
        reads = jax.lax.map(
            lambda s: simulate_exposure(s, tables, cfg).reads_dn, scenes)
        red = reduce_visit(reads, tables.gain, mid, base.orbit,
                           y_window=y_window, x_window=x_window,
                           bg_rows=bg_rows, n_chan=N_CHAN)
        wfit = fit_white_ramp(red.white_lc, mid, base.orbit, base.ld,
                              jnp.float32(0.155))
        chan = ramp_detrend(red.channel_lc, wfit, mid, base.orbit)
        rp_hat, _ = fit_depths(chan, mid, base.orbit, base.ld,
                               jnp.float32(0.155))
        return wfit.rp, rp_hat

    # injected proxy: noise-free, all trends off, plain depth fit
    cfg_clean = dataclasses.replace(cfg, noise=NoiseFlags.none())

    @jax.jit
    def run_clean():
        scenes = dataclasses.replace(
            visit0, key=jax.vmap(lambda e: jax.random.fold_in(
                jax.random.PRNGKey(123), e))(jnp.arange(N_EXP)))
        reads = jax.lax.map(
            lambda s: simulate_exposure(s, tables, cfg_clean).reads_dn,
            scenes)
        red = reduce_visit(reads, tables.gain, mid, base.orbit,
                           y_window=y_window, x_window=x_window,
                           bg_rows=bg_rows, n_chan=N_CHAN)
        rp_hat, _ = fit_depths(red.channel_lc, mid, base.orbit, base.ld,
                               jnp.float32(0.155))
        return rp_hat

    t0 = time.time()
    rp_clean = np.asarray(run_clean())
    rp_true = float(rp_clean.mean())

    def point(sin_amp, rw_amp, hook=0.003, sc=2.0, n_draw=None):
        n = n_draw or (args.n_draw if rw_amp > 0 else 1)
        ws, chs = [], []
        for d in range(n):
            w, ch = run(sin_amp, rw_amp, hook, sc, d)
            ws.append(float(w))
            chs.append(np.asarray(ch))
        ws = np.array(ws)
        ch_bias = np.stack(chs).mean(axis=0) - rp_clean
        return {
            "ssv_sin_amp": sin_amp, "ssv_rw_amp": rw_amp,
            "n_draw": n,
            "white_bias_mean": round(float(ws.mean() - rp_true), 6),
            "white_bias_sem": round(
                float(ws.std(ddof=1) / np.sqrt(n)) if n > 1 else 0.0, 6),
            "white_bias_draw_std": round(
                float(ws.std(ddof=1)) if n > 1 else 0.0, 6),
            "channel_bias_max": round(float(np.abs(ch_bias).max()), 6),
        }

    sin_amps = [0.0, 0.0075, 0.015, 0.03]
    rw_amps = [0.0, 0.005, 0.01]
    grid = [point(sa, ra) for sa in sin_amps for ra in rw_amps]

    # hook absorption: default SSV, hook swept 0..4x + first-orbit 4x
    hook_pts = [float(run(0.015, 0.0, h, sc, 0)[0])
                for h in (0.0, 0.003, 0.012) for sc in (1.0, 4.0)]
    hook_delta = float(np.ptp(hook_pts))

    wall = time.time() - t0
    default = next(g for g in grid
                   if g["ssv_sin_amp"] == 0.015 and g["ssv_rw_amp"] == 0.005)
    ok_default = abs(default["white_bias_mean"]) < 2e-3
    # the rw amplitude is the real lever: per-channel bias grows with it
    col = [g["channel_bias_max"] for g in grid
           if g["ssv_sin_amp"] == 0.015]
    ok_monotone = all(b2 >= b1 - 1e-4 for b1, b2 in zip(col, col[1:]))
    # sin amplitude is absorbed: quadrupling it moves the bias < 1e-4
    sin_rows = [g["white_bias_mean"] for g in grid
                if g["ssv_rw_amp"] == 0.0]
    ok_sin = float(np.ptp(sin_rows)) < 1e-4
    ok_hook = hook_delta < 5e-4

    out = {
        "backend": jax.default_backend(), "wallclock_s": round(wall, 1),
        "config": "validation visit, noise-free (mismatch bias is "
                  "deterministic per draw), ramp-fit reduction",
        "injected_proxy_rp": round(rp_true, 6),
        "grid": grid,
        "hook_absorption_max_delta": round(hook_delta, 6),
        "default_point_white_bias": default["white_bias_mean"],
        "default_white_bias_below_2e-3": bool(ok_default),
        "channel_bias_monotone_in_rw_amp": bool(ok_monotone),
        "sin_ssv_absorbed_below_1e-4": bool(ok_sin),
        "hook_fully_absorbed_below_5e-4": bool(ok_hook),
    }
    with open(os.path.join(REPO, "RAMP_ENVELOPE.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    if not (ok_default and ok_monotone and ok_sin and ok_hook):
        sys.exit(1)


if __name__ == "__main__":
    main()
