#!/usr/bin/env python
"""Run all five BASELINE.json benchmark configs -> BENCH_MATRIX.json.

  1. G141 staring single exposure, flat spectrum, noise off
  2. G141 staring full transit visit (WASP-43 b), Poisson + read noise
  3. G141 spatial-scan exposures with SSV + sky + flat-field
  4. Full scan visit, up-the-ramp SPARS10, dark + cosmic rays + ramps
  5. Batched Monte-Carlo ensemble over G102 + G141 (per-chip; scales
     linearly over a mesh — the compute has zero cross-device collectives)

Usage: python tools/bench_matrix.py   (run on the TPU)
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.exposure import simulate_exposure
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.parallel.ensemble import mc_scenes, simulate_ensemble_spectra
    from wayne_tpu.parallel.mesh import make_mesh, shard_scenes
    from wayne_tpu.scene import example_scene

    jnp.arange(4.0).sum().block_until_ready()
    on_tpu = jax.default_backend() == "tpu"
    results: dict[str, dict] = {}
    S, NL = 512, 512
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=15)
    base_scan = example_scene(NL, scan_speed=1.0)
    base_stare = example_scene(NL, scan_speed=0.0)

    def visit_scenes(base, n):
        sc = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n,) + a.shape), base)
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), i))(jnp.arange(n))
        return dataclasses.replace(sc, key=keys)

    cache_dir = os.path.join(REPO, ".jax_cache")

    def clear_compile_caches():
        # Degraded-binary retry (CLAUDE.md: the remote compile service
        # occasionally emits a ~20x-slow executable, consistent across
        # trials in-process). jax.clear_caches() alone is not enough:
        # the persistent disk cache would hand the same binary straight
        # back (identical cache key) — disable it and drop the entries.
        import shutil

        jax.config.update("jax_compilation_cache_dir", None)
        shutil.rmtree(cache_dir, ignore_errors=True)
        jax.clear_caches()

    def time_visit(name, cfg, base, n=304, chunk=16, tab=None,
                   floor_exp_s=250.0):
        tab = tables if tab is None else tab
        scenes = visit_scenes(base, n)

        def compile_and_measure():
            t0 = time.time()
            out = simulate_visit(scenes, tab, cfg, chunk)
            out.reads_dn.block_until_ready()
            compile_s = time.time() - t0
            best = float("inf")
            for rep in range(3):
                # fresh keys per trial + sub-20 ms discard: with a warm
                # persistent cache this backend serves repeated
                # IDENTICAL-input calls from a result-level cache in
                # ~0.1 ms (bench.py measurement-integrity note)
                s_i = dataclasses.replace(
                    scenes, key=scenes.key + jnp.uint32(rep + 1))
                jax.block_until_ready(s_i.key)
                t0 = time.time()
                out = simulate_visit(s_i, tab, cfg, chunk)
                out.reads_dn.block_until_ready()
                dt = time.time() - t0
                if dt < 0.02:
                    log(f"{name}: {dt * 1e3:.1f} ms trial discarded "
                        "(result-cache hit)")
                    continue
                best = min(best, dt)
            return best, compile_s

        best, compile_s = compile_and_measure()
        if on_tpu and n / best < floor_exp_s:
            log(f"{name}: {n / best:.0f} exp/s is under the {floor_exp_s} "
                f"floor — degraded binary suspected, recompiling once")
            clear_compile_caches()
            best2, _ = compile_and_measure()
            best = min(best, best2)
        results[name] = {"n_exposures": n, "wallclock_s": round(best, 4),
                         "exposures_per_sec": round(n / best, 1),
                         "compile_s": round(compile_s, 1)}
        log(f"{name}: {best:.3f}s ({n / best:.0f} exp/s)")

    pallas = on_tpu

    # 1: staring single exposure, flat spectrum, noise off
    cfg1 = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=15,
                          samp_seq="SPARS10", scan=False,
                          noise=NoiseFlags.none(), band_px=32)
    flat_scene = dataclasses.replace(
        base_stare, stellar_flux=jnp.full((NL,), 3.13e-10, jnp.float32))
    t0 = time.time()
    r = simulate_exposure(flat_scene, tables, cfg1)
    r.reads_dn.block_until_ready()
    compile1 = time.time() - t0
    best = float("inf")
    for i in range(5):
        t0 = time.time()
        r = simulate_exposure(
            dataclasses.replace(flat_scene, key=jax.random.PRNGKey(i)),
            tables, cfg1)
        r.reads_dn.block_until_ready()
        best = min(best, time.time() - t0)
    results["1_staring_ideal_single"] = {
        "wallclock_s": round(best, 5),
        "exposures_per_sec": round(1 / best, 1), "compile_s": round(compile1, 1),
        "caveat": "single blocking dispatch on a TUNNELED TPU: "
                  "wall-clock is dominated by the ~20-30 ms host<->device "
                  "RTT, not device compute (PERF.md xprof split) — "
                  "compare visit-scale rows for architecture numbers; "
                  "compile_s is the flaky remote compile service, not "
                  "the program"}
    log(f"config1 single ideal exposure: {best * 1e3:.2f} ms")

    # 2: staring transit visit, poisson + read noise
    noise2 = dataclasses.replace(NoiseFlags.none(), poisson=True,
                                 read_noise=True)
    cfg2 = ExposureStatic(subarray=S, n_lambda=NL, n_sub=2, nsamp=15,
                          samp_seq="SPARS10", scan=False, noise=noise2,
                          band_px=32, use_pallas=pallas,
                          compute_ideal=False)
    time_visit("2_staring_transit_visit", cfg2, base_stare)

    # 3: scan exposures with SSV + sky + flat
    noise3 = dataclasses.replace(NoiseFlags.none(), poisson=True, sky=True,
                                 flat=True, ssv=True)
    cfg3 = ExposureStatic(subarray=S, n_lambda=NL, n_sub=8, nsamp=15,
                          samp_seq="SPARS10", scan=True, noise=noise3,
                          band_px=32, use_pallas=pallas,
                          compute_ideal=False)
    time_visit("3_scan_ssv_sky_flat", cfg3, base_scan)

    # 4: the full-noise production visit (== bench.py headline)
    # compute_ideal=False matches the production Observation path
    # (ideal_e is a debug output; see ops/exposure.py).
    cfg4 = ExposureStatic(subarray=S, n_lambda=NL, n_sub=8, nsamp=15,
                          samp_seq="SPARS10", scan=True, band_px=32,
                          max_cr_per_read=160, use_pallas=pallas,
                          compute_ideal=False)
    time_visit("4_full_noise_visit", cfg4, base_scan)

    # 4b: FULL FRAME (1024^2, 5-px reference border) production visit —
    # the real detector's native format; the fused whole-exposure Pallas
    # kernel exceeds VMEM at this size, so this measures the row-tiled
    # per-read fallback path at a shorter visit length.
    tables_ff = synthetic_tables("G141", subarray=1024, n_lambda=NL,
                                 samp_seq="SPARS10", nsamp=15)
    base_ff = dataclasses.replace(
        base_scan, x_ref=jnp.float32(450.0), y_ref=jnp.float32(500.0))
    cfg_ff = dataclasses.replace(cfg4, subarray=1024, max_cr_per_read=448)
    time_visit("4b_full_frame_1024_visit", cfg_ff, base_ff, n=64, chunk=8,
               tab=tables_ff, floor_exp_s=30.0)   # known-good ~210 exp/s

    # 5: Monte-Carlo ensemble, G102 + G141, on-device extraction
    mesh = make_mesh(jax.devices()[:1])
    n_mc, n_exp = 16, 76
    ens_total = {}
    for grism in ("G141", "G102"):
        gt = synthetic_tables(grism, subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=15)
        visit = visit_scenes(base_scan, n_exp)
        ens = shard_scenes(mc_scenes(visit, n_mc), mesh)

        def run_ens():   # config 5 IS config 4 + on-device extraction
            t0 = time.time()
            sp = simulate_ensemble_spectra(ens, gt, cfg4, mesh)
            sp.block_until_ready()
            compile_s = time.time() - t0
            # fresh keys for the timed pass (result-cache hazard above)
            ens_t = dataclasses.replace(
                ens, key=ens.key + jnp.uint32(1))
            jax.block_until_ready(ens_t.key)
            t0 = time.time()
            sp = simulate_ensemble_spectra(ens_t, gt, cfg4, mesh)
            sp.block_until_ready()
            return time.time() - t0, compile_s

        dt, compile5 = run_ens()
        if on_tpu and n_mc / dt < 2.0:   # known-good ~18 visits/s/chip
            log(f"config5 {grism}: {n_mc / dt:.1f} visits/s under floor "
                "— degraded binary suspected, recompiling once")
            clear_compile_caches()
            dt2, _ = run_ens()
            dt = min(dt, dt2)
        ens_total[grism] = {
            "n_mc": n_mc, "n_exp": n_exp, "wallclock_s": round(dt, 3),
            "visits_per_sec_per_chip": round(n_mc / dt, 2),
            "compile_s": round(compile5, 1)}
        log(f"config5 {grism}: {n_mc} MC x {n_exp} exp in {dt:.2f}s "
            f"({n_mc / dt:.1f} visits/s/chip)")
    results["5_mc_ensemble"] = ens_total

    out = {"backend": jax.default_backend(), "device": str(jax.devices()[0]),
           "results": results}
    with open(os.path.join(REPO, "BENCH_MATRIX.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
