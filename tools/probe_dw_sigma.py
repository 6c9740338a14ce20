#!/usr/bin/env python
"""Isolate which systematic drives the divide-white sigma_rel
underreporting (VALIDATION.json with_systematics sigma_rel ratio ~3).

Runs the with_systematics ensemble shape at n=12 under flag variants,
printing per-variant relative-scatter/sigma_rel ratios. One process so
compiles amortise; paired clean runs share the RW draw per realisation.
"""
import argparse
import dataclasses
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-mc", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bg-rows", default="180:250")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.reduction import (cr_bad_diff_masks,
                                     divide_white_fit_depths,
                                     linearize_reads, reduce_visit)
    from wayne_tpu.scene import example_scene

    S, NL, NSAMP, N_EXP, N_CHAN = 256, 256, 5, 48, 8
    flags0 = dataclasses.replace(
        NoiseFlags.none(), poisson=True, read_noise=True, sky=True,
        dark=True, cosmic_rays=True, non_linearity=True, bias=True)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=4, nsamp=NSAMP,
                         samp_seq="SPARS25", scan=True, noise=flags0,
                         band_px=64,
                         use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS25", nsamp=NSAMP)
    base = example_scene(NL, scan_speed=0.5)
    wl = np.asarray(tables.wl_centers)
    rp_inj = 0.1595 + 0.003 * np.sin(8.0 * wl)
    starts = np.linspace(0.0, 4.0 * 3600.0, N_EXP)
    exptime = float(tables.read_times[-1])
    mid = jnp.asarray(starts + exptime / 2.0, jnp.float32)
    x_window, y_window = (104, 232), (40, 100)
    bg_rows = tuple(int(v) for v in args.bg_rows.split(":"))
    print(f"bg_rows={bg_rows}", flush=True)

    def mk_visit(rw_amp):
        b = dataclasses.replace(
            base, x_ref=jnp.float32(40.0), y_ref=jnp.float32(60.0),
            rp_over_rs=jnp.asarray(rp_inj, jnp.float32),
            trends=dataclasses.replace(base.trends,
                                       ssv_rw_amp=jnp.float32(rw_amp)))
        v = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (N_EXP,) + x.shape), b)
        return dataclasses.replace(
            v, exp_start_s=jnp.asarray(starts, jnp.float32))

    def make_run(local_cfg, visit):
        @jax.jit
        def run(m):
            keys = jax.vmap(lambda e: jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(123), m), e)
            )(jnp.arange(N_EXP))
            scenes = dataclasses.replace(visit, key=keys)

            def sim(s):
                res = simulate_exposure(s, tables, local_cfg)
                reads = res.reads_dn
                if local_cfg.noise.non_linearity:
                    reads = linearize_reads(
                        reads, tables.nonlin_coeffs, tables.full_well_e,
                        tables.gain,
                        bias_e=(tables.bias_map if local_cfg.noise.bias
                                else None)) / tables.gain
                return reads, res.cr_pos, res.cr_count

            reads, cr_pos, cr_count = jax.lax.map(sim, scenes)
            good = None
            if local_cfg.noise.cosmic_rays:
                good = jax.vmap(lambda p, c: ~cr_bad_diff_masks(
                    p, c, S))(cr_pos, cr_count)
            red = reduce_visit(reads, tables.gain, mid, base.orbit,
                               y_window=y_window, x_window=x_window,
                               bg_rows=bg_rows, n_chan=N_CHAN,
                               good_diffs=good)
            return divide_white_fit_depths(
                red.white_lc, red.channel_lc, mid, base.orbit, base.ld,
                jnp.float32(0.155), return_components=True)

        return run

    def variant(name, extra_flags, rw_amp):
        visit = mk_visit(rw_amp)
        fl = dataclasses.replace(flags0, **extra_flags)
        clean_fl = dataclasses.replace(
            NoiseFlags.none(),
            ssv=extra_flags.get("ssv", False),
            visit_trend=extra_flags.get("visit_trend", False))
        run_n = make_run(dataclasses.replace(cfg, noise=fl), visit)
        run_c = make_run(dataclasses.replace(cfg, noise=clean_fl), visit)
        t0 = time.time()
        outs_n = [run_n(m) for m in range(args.n_mc)]
        outs_c = [run_c(m) for m in range(args.n_mc)]
        rp_n = np.stack([np.asarray(o[0]) for o in outs_n])
        rel = np.stack([np.asarray(o[2]) for o in outs_n]).mean(axis=0)
        rp_c = np.stack([np.asarray(o[0]) for o in outs_c])
        dev = rp_n - rp_c
        d = dev - dev.mean(axis=1, keepdims=True)
        scat = d.std(axis=0, ddof=1) / np.sqrt(1 - 1 / N_CHAN)
        ratio = scat / np.maximum(rel, 1e-12)
        print(f"{name:28s} ratio={np.round(ratio, 2).tolist()} "
              f"({time.time() - t0:.0f}s)", flush=True)

    variant("full (ssv+rw+trend+drift)",
            dict(ssv=True, visit_trend=True, bias_drift=True), 0.005)
    variant("no bias_drift",
            dict(ssv=True, visit_trend=True), 0.005)
    variant("sin-only ssv (+trend+drift)",
            dict(ssv=True, visit_trend=True, bias_drift=True), 0.0)
    variant("no ssv (trend+drift)",
            dict(visit_trend=True, bias_drift=True), 0.005)
    variant("noise only", dict(), 0.005)


if __name__ == "__main__":
    main()

