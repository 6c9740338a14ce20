#!/usr/bin/env python
"""Capture an xprof trace + stage timings of a visit (aux subsystem demo).

    python tools/profile_visit.py --logdir /tmp/wayne_trace
"""

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", default="/tmp/wayne_trace")
    parser.add_argument("--n", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.scene import example_scene
    from wayne_tpu.utils.profiling import StageTimers, device_trace

    S = 128 if args.cpu else 512
    cfg = ExposureStatic(subarray=S, n_lambda=S, n_sub=8, nsamp=15,
                         samp_seq="SPARS10", scan=True, band_px=32,
                         max_cr_per_read=160, compute_ideal=False,
                         use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=S,
                              samp_seq="SPARS10", nsamp=15)
    base = example_scene(S, scan_speed=1.0)
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (args.n,) + a.shape), base)
    scenes = dataclasses.replace(
        scenes, key=jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), i))(jnp.arange(args.n)))

    timers = StageTimers()
    with timers.stage("compile+first run"):
        out = simulate_visit(scenes, tables, cfg, 16)
        out.reads_dn.block_until_ready()
    with timers.stage("steady visit"):
        out = simulate_visit(scenes, tables, cfg, 16)
        out.reads_dn.block_until_ready()
    with device_trace(args.logdir):
        with timers.stage("traced visit"):
            out = simulate_visit(scenes, tables, cfg, 16)
            out.reads_dn.block_until_ready()
    print(timers.report())
    print(f"trace -> {args.logdir} (view with tensorboard/xprof)")


if __name__ == "__main__":
    main()
