#!/usr/bin/env python
"""Cold-start compile-time breakdown for the flagship visit program.

Round-4 weak item 5: first-visit warmup is 30-40 s (and the full-config
compile was once 215 s) with no measurement of WHERE it goes. This
splits the pipeline per stage — trace (jaxpr), lower (StableHLO),
backend compile (XLA / remote service) — for:

  * the bench-class 512^2/NSAMP=15 visit program (Pallas fused readout),
  * the same program with use_pallas=False (isolates the Mosaic share),
  * a trivial op (isolates the per-compile service round-trip floor).

It also checks whether the persistent compilation cache serves a SECOND
process (CLAUDE.md records it does not on this backend) by re-running
itself once with --child.

Writes COMPILE.json; PERF.md summarises.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage_times(fn, args):
    import jax

    j = jax.jit(fn)
    t0 = time.time()
    traced = j.trace(*args)
    t_trace = time.time() - t0
    t0 = time.time()
    lowered = traced.lower()
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    t_run = time.time() - t0
    return dict(trace_s=round(t_trace, 2), lower_s=round(t_lower, 2),
                backend_compile_s=round(t_compile, 2),
                first_run_s=round(t_run, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true",
                    help="second-process cache probe (internal)")
    ap.add_argument("--cache", default=None,
                    help="persistent cache dir to use (child probe)")
    ap.add_argument("--small", action="store_true",
                    help="128^2 config (fast CPU smoke)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)

    import dataclasses

    from wayne_tpu.config import ObservationConfig
    from wayne_tpu.observation import Observation
    from wayne_tpu.ops.visit import pad_scenes, simulate_visit

    if args.small:
        cfg_o = ObservationConfig(subarray=128, nsamp=4,
                                  samp_seq="SPARS10", scan=True,
                                  n_lambda=64, n_sub=2, n_orbits=1,
                                  seed=7)
        chunk = 4
    else:
        cfg_o = ObservationConfig(subarray=512, nsamp=15,
                                  samp_seq="SPARS10", scan=True,
                                  scan_speed_pix_s=1.0, n_lambda=512,
                                  n_sub=8, n_orbits=2, seed=7)
        chunk = 16
    obs = Observation(cfg_o)
    scenes, _ = pad_scenes(obs.scenes, chunk)
    scenes = jax.device_put(scenes)
    jnp.arange(4.0).sum().block_until_ready()   # session warm

    out = {"backend": jax.default_backend(),
           "config": f"{cfg_o.subarray}^2 NSAMP={cfg_o.nsamp} "
                     f"chunk={chunk} pallas={obs.static.use_pallas}"}

    # per-compile service floor
    out["tiny_op"] = stage_times(lambda x: (x * 2 + 1).sum(),
                                 (jnp.arange(1024.0),))

    cfg = obs.static

    def visit(s):
        return simulate_visit(s, obs.tables, cfg, chunk).reads_dn.sum()

    out["visit"] = stage_times(visit, (scenes,))

    if cfg.use_pallas:
        cfg_x = dataclasses.replace(cfg, use_pallas=False)

        def visit_xla(s):
            return simulate_visit(s, obs.tables, cfg_x,
                                  chunk).reads_dn.sum()

        out["visit_xla_only"] = stage_times(visit_xla, (scenes,))

    if not args.child:
        # does the persistent cache serve a SECOND process?
        cache = os.path.join(REPO, ".jax_cache_probe")
        os.makedirs(cache, exist_ok=True)
        env = dict(os.environ)
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--cache", cache] + (["--small"] if args.small else [])
        t0 = time.time()
        r1 = subprocess.run(cmd, capture_output=True, text=True, env=env)
        wall1 = time.time() - t0
        t0 = time.time()
        r2 = subprocess.run(cmd, capture_output=True, text=True, env=env)
        wall2 = time.time() - t0
        child1 = child2 = None
        for line in r1.stdout.splitlines():
            if line.startswith("{"):
                child1 = json.loads(line)
        for line in r2.stdout.splitlines():
            if line.startswith("{"):
                child2 = json.loads(line)
        if child1 and child2:
            out["persistent_cache_probe"] = {
                "first_process_visit_compile_s":
                    child1["visit"]["backend_compile_s"],
                "second_process_visit_compile_s":
                    child2["visit"]["backend_compile_s"],
                "first_wall_s": round(wall1, 1),
                "second_wall_s": round(wall2, 1),
                "cache_survives_process_boundary": bool(
                    child2["visit"]["backend_compile_s"]
                    < 0.3 * max(child1["visit"]["backend_compile_s"],
                                1e-9)),
            }
        else:
            out["persistent_cache_probe"] = {
                "error": (r1.stderr[-500:] if child1 is None
                          else r2.stderr[-500:])}
        with open(os.path.join(REPO, "COMPILE.json"), "w") as fh:
            json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
