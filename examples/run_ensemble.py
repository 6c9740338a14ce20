#!/usr/bin/env python
"""Example: generate a Monte-Carlo transit-visit dataset on TPU.

Simulates N realisations of a WASP-43b-like G141 scan visit with the
transmission spectrum scaled per realisation, reduces each exposure to an
extracted spectrum ON DEVICE, and writes a labelled, resumable dataset.

    python examples/run_ensemble.py --n-mc 64 --outdir /tmp/wayne_ds
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-mc", type=int, default=64)
    parser.add_argument("--chunk-mc", type=int, default=16)
    parser.add_argument("--n-exp", type=int, default=76)
    parser.add_argument("--outdir", default="wayne_dataset")
    parser.add_argument("--subarray", type=int, default=512)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ObservationConfig
    from wayne_tpu.parallel.dataset import generate_dataset
    from wayne_tpu.scene import example_scene

    S = args.subarray
    obs = ObservationConfig(subarray=S, nsamp=15, samp_seq="SPARS10",
                            scan=True, n_lambda=S)
    cfg = dataclasses.replace(obs.exposure_static(),
                              use_pallas=jax.default_backend() == "tpu")
    tables = synthetic_tables("G141", subarray=S, n_lambda=S,
                              samp_seq="SPARS10", nsamp=15)

    base = example_scene(S, scan_speed=1.0)
    starts = np.linspace(0.0, 4 * 3600.0, args.n_exp)
    visit = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (args.n_exp,) + x.shape), base)
    visit = dataclasses.replace(
        visit, exp_start_s=jnp.asarray(starts, jnp.float32))

    # label: per-realisation transmission-spectrum scale (the quantity an
    # ML retrieval would learn to recover)
    rng = np.random.RandomState(0)
    scale = rng.uniform(0.95, 1.05, args.n_mc)
    rp = np.asarray(base.rp_over_rs)[None, :] * scale[:, None]

    manifest = generate_dataset(
        visit, tables, cfg, args.outdir, n_mc=args.n_mc,
        chunk_mc=args.chunk_mc,
        overrides={"rp_over_rs": jnp.asarray(rp, jnp.float32)},
        labels={"rp_scale": scale},
        progress=print)
    print(f"dataset complete: {manifest['n_mc']} visits x "
          f"{manifest['n_exp']} exposures -> {args.outdir}")


if __name__ == "__main__":
    main()
