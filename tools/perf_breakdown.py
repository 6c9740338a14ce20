#!/usr/bin/env python
"""Stage-cost breakdown of the headline kernel by controlled ablation
-> PERF.json (the measured basis of PERF.md).

Same-process A/B ladder on the production config (512^2, NSAMP=15
SPARS10 scan, full noise, fused Pallas readout, banded splat): each rung
switches one stage off (or swaps one implementation) and the time delta
attributes cost to that stage. Only same-process comparisons are valid
on this backend (session throughput varies +-15% run to run).

Also measures the end-to-end Observation.generate() file path plain vs
quantize_adc (uint16 over the link) — the round-2 inversion regression.

Usage: python tools/perf_breakdown.py [--n 64] (run on the TPU)
"""

import argparse
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--gen-n", type=int, default=24)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic, NoiseFlags
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.scene import example_scene

    jnp.arange(4.0).sum().block_until_ready()
    on_tpu = jax.default_backend() == "tpu"
    S = 128 if args.cpu else 512
    NL, N = S, args.n
    tables = synthetic_tables("G141", subarray=S, n_lambda=NL,
                              samp_seq="SPARS10", nsamp=15)
    base = example_scene(NL, scan_speed=1.0)
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), base)
    scenes = dataclasses.replace(
        scenes, key=jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), i))(jnp.arange(N)))

    headline = ExposureStatic(
        subarray=S, n_lambda=NL, n_sub=8, nsamp=15, samp_seq="SPARS10",
        scan=True, band_px=32, max_cr_per_read=160, compute_ideal=False,
        use_pallas=on_tpu)

    def timed(name, cfg, repeats=4):
        t0 = time.time()
        out = simulate_visit(scenes, tables, cfg, 16)
        out.reads_dn.block_until_ready()
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            out = simulate_visit(scenes, tables, cfg, 16)
            out.reads_dn.block_until_ready()
            best = min(best, time.time() - t0)
        log(f"{name}: {best * 1e3 / N:.3f} ms/exp "
            f"({N / best:.0f} exp/s; compile {compile_s:.0f}s)")
        return {"ms_per_exp": round(best * 1e3 / N, 4),
                "exp_per_s": round(N / best, 1),
                "compile_s": round(compile_s, 1)}

    results = {"config": {"S": S, "n_lambda": NL, "nsamp": 15,
                          "n_sub": 8, "n_exposures": N,
                          "backend": jax.default_backend(),
                          "device": str(jax.devices()[0])}}

    # The ladder. Deltas vs 'full' attribute cost to the switched stage.
    results["full"] = timed("full (headline)", headline)
    results["no_poisson"] = timed(
        "no poisson", dataclasses.replace(
            headline, noise=dataclasses.replace(headline.noise,
                                                poisson=False)))
    results["no_read_noise"] = timed(
        "no read noise", dataclasses.replace(
            headline, noise=dataclasses.replace(headline.noise,
                                                read_noise=False)))
    results["no_cosmic_rays"] = timed(
        "no cosmic rays", dataclasses.replace(
            headline, noise=dataclasses.replace(headline.noise,
                                                cosmic_rays=False)))
    results["physics_only"] = timed(
        "physics only (noise none)", dataclasses.replace(
            headline, noise=NoiseFlags.none()))
    results["n_sub_2"] = timed(
        "n_sub=2 (row profiles / LC scale)", dataclasses.replace(
            headline, n_sub=2))
    results["quad_16"] = timed(
        "transit_quad=16", dataclasses.replace(headline, transit_quad=16))
    results["xla_chain"] = timed(
        "XLA noise chain (use_pallas=False)", dataclasses.replace(
            headline, use_pallas=False))
    if on_tpu:
        results["per_read_kernels"] = timed(
            "per-read Pallas kernels (fused_reads=False)",
            dataclasses.replace(headline, fused_reads=False))

    # ---- end-to-end generate(): plain vs quantize_adc -----------------
    import shutil
    import tempfile

    from wayne_tpu.config import config_from_dict
    from wayne_tpu.observation import Observation

    gen = {}
    for tag, quant in (("f32", False), ("uint16", True)):
        pars = dict(grism="G141", subarray=S, nsamp=15, samp_seq="SPARS10",
                    scan=True, x_ref=256.0 if S == 512 else 30.0,
                    y_ref=128.0 if S == 512 else 40.0,
                    n_orbits=1, exposures_per_orbit=args.gen_n,
                    n_lambda=NL, quantize_adc=quant, seed=1)
        obs = Observation(config_from_dict(pars))
        d = tempfile.mkdtemp()
        try:
            obs.generate(d, chunk=8, progress=lambda s: None)  # compile+warm
            shutil.rmtree(d)
            os.makedirs(d)
            t0 = time.time()
            paths = obs.generate(d, chunk=8, progress=lambda s: None)
            dt = time.time() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)
        n = len(paths)
        gen[tag] = {"n_exposures": n, "wallclock_s": round(dt, 3),
                    "exp_per_s": round(n / dt, 3)}
        log(f"generate {tag}: {n / dt:.2f} exp/s")
    results["generate_end_to_end"] = gen

    with open(os.path.join(REPO, "PERF.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
