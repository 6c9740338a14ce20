"""Command-line entry point for Monte-Carlo dataset generation.

Goes beyond the reference (which only generates single visits): a
labelled, resumable spectral-dataset producer over the same YAML
parameter files, built on :mod:`wayne_tpu.parallel.dataset`.

Usage:
    python -m wayne_tpu.run_dataset -p pars.yml -o dataset_dir \
        --n-mc 1000 [--chunk-mc 16] [--rp-sigma 0.002] [--seed 0]

Each realisation reuses the planned visit (pointing drift, transit
timing) with independent noise; ``--rp-sigma`` additionally sweeps the
continuum Rp/Rs per realisation (Gaussian around the configured value)
and stores it as a per-realisation label. Output: ``chunk_XXXX.npz``
files with extracted spectra + labels and a ``manifest.json``; rerunning
resumes at the first missing chunk.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="wayne_tpu.run_dataset",
        description="Generate a labelled Monte-Carlo spectral dataset.")
    parser.add_argument("-p", "--parameter-file", required=True)
    parser.add_argument("-o", "--outdir", required=True)
    parser.add_argument("--n-mc", type=int, required=True,
                        help="number of Monte-Carlo visit realisations")
    parser.add_argument("--chunk-mc", type=int, default=16,
                        help="realisations per device chunk / output file")
    parser.add_argument("--rp-sigma", type=float, default=0.0,
                        help="per-realisation Gaussian sweep of Rp/Rs")
    parser.add_argument("--fp-sigma", type=float, default=0.0,
                        help="per-realisation Gaussian sweep of the eclipse "
                             "depth Fp/Fs (requires planet eclipse_depth)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--raw-cr", action="store_true",
                        help="keep simulated cosmic rays IN the spectra "
                             "(training-realism datasets) instead of the "
                             "default DQ-aware repair at extraction")
    parser.add_argument("--recover", type=int, nargs="?", const=8,
                        default=None, metavar="N_CHAN",
                        help="also reduce every chunk on device and "
                             "store recovered_rp/_sigma labels "
                             "(N_CHAN channels, default 8) — exposes "
                             "the reduction-systematic structure that "
                             "injected labels alone hide (transit "
                             "datasets only)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation
    from wayne_tpu.parallel.dataset import generate_dataset

    if args.n_mc % args.chunk_mc:
        parser.error("--n-mc must be a multiple of --chunk-mc")

    cfg = load_yaml(args.parameter_file)
    obs = Observation(cfg)
    print(f"{cfg.grism} dataset: {args.n_mc} realisations x "
          f"{obs.plan.n_exposures} exposures ({cfg.subarray}^2, "
          f"NSAMP={cfg.nsamp})")

    overrides: dict = {}
    labels = {}
    if args.rp_sigma > 0.0:
        rng = np.random.RandomState(args.seed)
        rp = (cfg.planet.rp_over_rs
              + args.rp_sigma * rng.standard_normal(args.n_mc)
              ).astype(np.float32)
        nl = cfg.n_lambda
        overrides["rp_over_rs"] = np.broadcast_to(
            rp[:, None], (args.n_mc, nl)).copy()
        labels["rp"] = rp
    if args.fp_sigma > 0.0:
        if not obs.static.eclipse:
            parser.error("--fp-sigma requires planet eclipse_depth or "
                         "eclipse_file in the parameter file")
        rng = np.random.RandomState(args.seed + 1)
        # Additive Gaussian shift of the CONFIGURED contrast spectrum
        # (preserves an eclipse_file's wavelength structure); clipped so
        # every channel's Fp/Fs stays physical.
        fp_grid = obs.planet.fp_on_grid(
            np.asarray(obs.tables.wl_centers))          # (NL,)
        delta = (args.fp_sigma
                 * rng.standard_normal(args.n_mc)).astype(np.float32)
        fp_mc = np.clip(fp_grid[None, :] + delta[:, None], 0.0, None
                        ).astype(np.float32)            # (n_mc, NL)
        overrides["fp_over_fs"] = fp_mc
        labels["fp"] = fp_mc.mean(axis=1)               # band-mean contrast

    recover = None
    if args.recover is not None:
        if args.recover < 1:
            parser.error("--recover needs at least 1 channel")
        if obs.static.eclipse:
            parser.error("--recover fits transit depths; eclipse/"
                         "phase-curve datasets are not supported")
        import jax
        import jax.numpy as jnp

        from wayne_tpu.ops.dispersion import trace_params, wl_to_x

        tp = trace_params(obs.tables, obs.scenes.x_ref[0],
                          obs.scenes.y_ref[0])
        xc = np.asarray(wl_to_x(obs.tables.wl_centers, tp))
        x_lo = int(max(np.floor(xc.min()), 0))
        x_hi = int(min(np.ceil(xc.max()) + 1, cfg.subarray))
        if x_hi - x_lo < args.recover:
            parser.error("--recover: dispersed trace covers "
                         f"{x_hi - x_lo} columns < {args.recover} "
                         "channels")
        ld = jnp.asarray(obs.scenes.ld[0], jnp.float32)
        if ld.ndim == 2:
            ld = jnp.mean(ld, axis=0)
        exptime = float(obs.tables.read_times[-1])
        recover = {
            "exp_mid_s": jnp.asarray(
                np.asarray(obs.scenes.exp_start_s) + exptime / 2.0,
                jnp.float32),
            "orbit": jax.tree_util.tree_map(lambda x: x[0],
                                            obs.scenes.orbit),
            "ld": ld, "rp0": float(cfg.planet.rp_over_rs or 0.15),
            "x_window": (x_lo, x_hi), "n_chan": args.recover,
        }
        # forward/reverse alternation: per-direction OOT normalisation
        # removes the upstream/downstream offset from recovered labels
        rev = np.asarray(obs.scenes.scan_speed) < 0
        if rev.any():
            recover["scan_dir"] = jnp.asarray(rev, jnp.float32)
        print(f"recovered labels: {args.recover} channels over columns "
              f"[{x_lo}, {x_hi})")

    # persistence: enabled in YAML must reach the MC realisations too —
    # the frame-product path attaches the per-exposure afterglow maps in
    # generate(); datasets share the one stimulus solution across
    # realisations (the noise-free ideal drives it, and per-realisation
    # physics sweeps perturb the stimulus by far less than the
    # systematic itself).
    obs._ensure_persistence()
    obs._ensure_recte()   # charge-trap maps share the same Scene-leaf ride

    manifest = generate_dataset(
        obs.scenes, obs.tables, obs.static, args.outdir,
        n_mc=args.n_mc, chunk_mc=args.chunk_mc, seed=args.seed,
        overrides=overrides or None, labels=labels or None, progress=print,
        dq_aware=not args.raw_cr, recover=recover)
    print(f"dataset complete: {len(manifest['chunks'])} chunks in "
          f"{args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
