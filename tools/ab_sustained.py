#!/usr/bin/env python
"""A/B: single blocking visit calls vs pipelined back-to-back dispatches.

The xprof trace (tools/profile_visit.py) shows the 64-exposure visit's
device module executes in ~34.5 ms while the blocking call takes
~63.6 ms wall: ~29 ms per CALL is host->device dispatch + sync latency
over this machine's tunneled TPU link, independent of visit length —
the "fixed per-exposure cost" PERF.md could not attribute. A production
host (PCIe-attached chip) does not pay a multi-ms RTT per dispatch, and
even here the chip itself is idle during it. Sustained throughput =
dispatch R visits back-to-back (async), block once at the end: the
dispatch gaps overlap device execution and the per-call RTT amortizes.

To pipeline without holding R full (N,16,S,S) read stacks in HBM
(5.1 GB each at N=304), the probe reduces the reads to a scalar
on-device; the reduction costs one pass over the stack (~3%,
conservative — the sustained number UNDERSTATES the kernel).

Usage: python tools/ab_sustained.py [--n 304] [--r 4]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=304)
    parser.add_argument("--r", type=int, default=4)
    parser.add_argument("--chunk", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from functools import partial

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.ops.visit import simulate_visit
    from wayne_tpu.scene import example_scene
    import dataclasses

    jnp.arange(4.0).sum().block_until_ready()
    log(f"[ab] backend {jax.default_backend()}")
    S, N = 512, args.n
    tables = synthetic_tables("G141", subarray=S, n_lambda=S,
                              samp_seq="SPARS10", nsamp=15)
    base = example_scene(S, scan_speed=1.0)
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N,) + a.shape), base)
    scenes = dataclasses.replace(
        scenes, key=jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(0), i))(jnp.arange(N)))
    scenes = jax.device_put(scenes)
    tables = jax.device_put(tables)

    from wayne_tpu.config import ExposureStatic
    cfg = ExposureStatic(subarray=S, n_lambda=S, n_sub=8, nsamp=15,
                         samp_seq="SPARS10", scan=True, band_px=32,
                         max_cr_per_read=160, compute_ideal=False,
                         use_pallas=jax.default_backend() == "tpu")

    @partial(jax.jit, static_argnames=())
    def visit_sum(s):
        out = simulate_visit(s, tables, cfg, args.chunk)
        return out.reads_dn.sum()

    t0 = time.time()
    visit_sum(scenes).block_until_ready()
    log(f"[ab] warmup compile+run: {time.time() - t0:.1f}s")

    # full-output single calls (what bench.py times today)
    full = jax.jit(lambda s: simulate_visit(s, tables, cfg, args.chunk))
    t0 = time.time()
    full(scenes).reads_dn.block_until_ready()
    log(f"[ab] full-output warmup: {time.time() - t0:.1f}s")
    singles_full = []
    for _ in range(3):
        t0 = time.time()
        full(scenes).reads_dn.block_until_ready()
        singles_full.append(time.time() - t0)
    log(f"[ab] single full-output visit: {min(singles_full):.4f}s "
        f"({N / min(singles_full):.1f} exp/s)")

    singles = []
    for _ in range(3):
        t0 = time.time()
        visit_sum(scenes).block_until_ready()
        singles.append(time.time() - t0)
    log(f"[ab] single reduced visit:     {min(singles):.4f}s "
        f"({N / min(singles):.1f} exp/s)")

    for r in (2, args.r, 2 * args.r):
        walls = []
        for _ in range(2):
            t0 = time.time()
            outs = [visit_sum(scenes) for _ in range(r)]
            outs[-1].block_until_ready()
            walls.append(time.time() - t0)
        w = min(walls)
        log(f"[ab] pipelined x{r}: {w:.4f}s total -> {w / r:.4f}s/visit "
            f"({r * N / w:.1f} exp/s sustained)")


if __name__ == "__main__":
    main()
