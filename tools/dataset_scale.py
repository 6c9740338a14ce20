#!/usr/bin/env python
"""BASELINE config 5 at scale: a 10k-visit Monte-Carlo dataset on one chip.

Runs `parallel/dataset.py::generate_dataset` for a 10,000-visit chunked
G141+G102 ensemble (5,000 realisations per grism, 76-exposure scan visits,
512x512, full noise, on-device spectral extraction), with per-realisation
transmission-spectrum labels swept via `sweep_scenes`. Records:

  * sustained visits/s/chip including host npz writes,
  * resume-after-kill behavior (phase 1 writes the first chunks, the full
    phase-2 run must skip exactly those),
  * output size.

Writes DATASET_SCALE.json at the repo root. The dataset itself goes to a
scratch directory and is deleted after the numbers are recorded (the
artifact is the measurement, not the 1 GB of spectra).

Usage: python tools/dataset_scale.py [n_per_grism] (run on the TPU)
"""

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    n_per_grism = int(sys.argv[1]) if len(sys.argv) > 1 else 5000

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from wayne_tpu.calibration import synthetic_tables
    from wayne_tpu.config import ExposureStatic
    from wayne_tpu.parallel.dataset import generate_dataset
    from wayne_tpu.parallel.mesh import make_mesh
    from wayne_tpu.scene import example_scene

    jnp.arange(4.0).sum().block_until_ready()
    on_tpu = jax.default_backend() == "tpu"

    S, NL, N_EXP, CHUNK_MC = 512, 512, 76, 20
    if n_per_grism % CHUNK_MC:
        n_per_grism -= n_per_grism % CHUNK_MC
        log(f"n_per_grism truncated to the chunk multiple {n_per_grism}")
    # Phase 2 must generate NEW chunks beyond phase 1's, or the measured
    # rate divides by zero visits.
    n_per_grism = max(n_per_grism, 11 * CHUNK_MC)
    cfg = ExposureStatic(subarray=S, n_lambda=NL, n_sub=8, nsamp=15,
                         samp_seq="SPARS10", scan=True, band_px=32,
                         max_cr_per_read=160, use_pallas=on_tpu)
    mesh = make_mesh(jax.devices()[:1])
    base = example_scene(NL, scan_speed=1.0)

    # (no per-exposure keys here: generate_dataset's mc_scenes replaces
    # the key leaf with seed+global-index derivations anyway)
    scenes = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (N_EXP,) + a.shape), base)
    rng = np.random.RandomState(42)

    record: dict = {"backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "n_per_grism": n_per_grism, "n_exp": N_EXP,
                    "subarray": S, "chunk_mc": CHUNK_MC, "grisms": {}}
    scratch = tempfile.mkdtemp(prefix="wayne_dataset_")
    total_visits = 0
    total_wall = 0.0
    try:
        for grism in ("G141", "G102"):
            tables = synthetic_tables(grism, subarray=S, n_lambda=NL,
                                      samp_seq="SPARS10", nsamp=15)
            # Per-realisation physics labels: continuum Rp/Rs sweep.
            rp = rng.uniform(0.08, 0.17, n_per_grism).astype(np.float32)
            overrides = {"rp_over_rs": np.broadcast_to(
                rp[:, None], (n_per_grism, NL)).copy()}
            outdir = os.path.join(scratch, grism)

            # Phase 1: partial run, then "kill" (return). Phase 2 must
            # resume by skipping exactly these chunks.
            n_phase1 = min(10 * CHUNK_MC, n_per_grism)
            generate_dataset(scenes, tables, cfg, outdir, n_mc=n_phase1,
                             chunk_mc=CHUNK_MC, seed=3,
                             overrides={k: v[:n_phase1]
                                        for k, v in overrides.items()},
                             labels={"rp": rp[:n_phase1]}, mesh=mesh)
            pre = set(os.listdir(outdir))
            log(f"[{grism}] phase 1 (pre-kill): {len(pre) - 1} chunks")

            skipped = []
            t0 = time.time()
            manifest = generate_dataset(
                scenes, tables, cfg, outdir, n_mc=n_per_grism,
                chunk_mc=CHUNK_MC, seed=3, overrides=overrides,
                labels={"rp": rp}, mesh=mesh,
                progress=lambda s: skipped.append(s) if "skip" in s else None)
            wall = time.time() - t0
            size = sum(os.path.getsize(os.path.join(outdir, f))
                       for f in os.listdir(outdir))
            new_visits = n_per_grism - n_phase1
            record["grisms"][grism] = {
                "n_mc": n_per_grism,
                "chunks": len(manifest["chunks"]),
                "resume_skipped_chunks": len(skipped),
                "resume_ok": len(skipped) == n_phase1 // CHUNK_MC,
                "phase2_wallclock_s": round(wall, 1),
                "sustained_visits_per_s_per_chip": round(new_visits / wall, 2),
                "exposures_per_s": round(new_visits * N_EXP / wall, 1),
                "output_bytes": size,
            }
            total_visits += new_visits
            total_wall += wall
            log(f"[{grism}] {new_visits} visits in {wall:.1f}s "
                f"({new_visits / wall:.2f} visits/s/chip, "
                f"{size / 1e6:.0f} MB), resume skipped {len(skipped)}")

        record["total_visits_generated"] = total_visits + 2 * min(
            10 * CHUNK_MC, n_per_grism)
        record["sustained_visits_per_s_per_chip"] = round(
            total_visits / total_wall, 2)
        record["projected_10k_visits_minutes"] = round(
            10000 / (total_visits / total_wall) / 60.0, 1)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    with open(os.path.join(REPO, "DATASET_SCALE.json"), "w") as fh:
        json.dump(record, fh, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
