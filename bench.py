#!/usr/bin/env python
"""Driver benchmark: G141 scan exposures/sec/chip (NSAMP=15).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The scenario is BASELINE.json's north-star workload: a full G141
spatial-scan transit visit — 304 exposures x NSAMP=15 SPARS10 reads on a
512x512 subarray with the full noise chain (Poisson, read, dark, sky,
flat, non-linearity, cosmic rays, SSV, visit trends) — run entirely
on-device as one jitted program.

vs_baseline compares against the single-core CPU oracle implementation
(the reference's fine-subsample algorithm, measured by
tools/measure_cpu_baseline.py into BASELINE_CPU.json; the reference
itself publishes no numbers — BASELINE.md).
"""

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))

N_EXPOSURES = 304
CHUNK = 16


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    cache = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ObservationConfig
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.scene import example_scene

    jnp.arange(8.0).sum().block_until_ready()
    log(f"[bench] session up on {jax.devices()[0].platform} "
        f"({time.time() - t_start:.1f}s)")

    obs = ObservationConfig(subarray=512, nsamp=15, samp_seq="SPARS10",
                            scan=True, scan_speed_pix_s=1.0,
                            n_lambda=512, n_sub=8)
    cfg = obs.exposure_static()
    if jax.default_backend() == "tpu":
        # Pallas fused readout (hardware-PRNG path, validated statistically
        # on-device; ~25% faster than the XLA noise chain).
        cfg = dataclasses.replace(cfg, use_pallas=True)
    tables = synthetic_tables("G141", subarray=512, n_lambda=512,
                              samp_seq="SPARS10", nsamp=15)
    base = example_scene(512, scan_speed=1.0)
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N_EXPOSURES,) + a.shape), base)

    def with_keys(seed: int):
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(seed), i))(jnp.arange(N_EXPOSURES))
        return dataclasses.replace(scenes, key=keys)

    t0 = time.time()
    out = simulate_visit(with_keys(0), tables, cfg, CHUNK)
    out.reads_dn.block_until_ready()
    log(f"[bench] warmup (compile+run): {time.time() - t0:.1f}s")

    best = float("inf")
    for trial in range(3):
        t0 = time.time()
        out = simulate_visit(with_keys(trial + 1), tables, cfg, CHUNK)
        out.reads_dn.block_until_ready()
        dt = time.time() - t0
        best = min(best, dt)
        log(f"[bench] visit {N_EXPOSURES} exposures: {dt:.3f}s "
            f"({N_EXPOSURES / dt:.1f} exp/s)")

    exp_per_sec = N_EXPOSURES / best

    vs_baseline = None
    baseline_path = os.path.join(REPO, "BASELINE_CPU.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as fh:
            cpu = json.load(fh)
        cpu_exp_per_sec = cpu.get("exposures_per_sec")
        if cpu_exp_per_sec:
            vs_baseline = exp_per_sec / cpu_exp_per_sec
            log(f"[bench] CPU oracle baseline: {cpu_exp_per_sec:.4g} exp/s "
                f"-> speedup {vs_baseline:.1f}x")

    print(json.dumps({
        "metric": "G141 scan exposures/sec/chip (NSAMP=15, full noise)",
        "value": round(exp_per_sec, 2),
        "unit": "exposures/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "full_visit_wallclock_s": round(best, 3),
        "n_exposures": N_EXPOSURES,
    }))


if __name__ == "__main__":
    main()
