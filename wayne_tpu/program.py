"""Multi-visit observing programs.

Beyond the reference (one visit per run; reference: wayne/run_visit.py
simulates a single visit): a ``Program`` drives N same-target visits
with the cross-visit physics a single-visit simulator cannot express —

- **persistence carried across visit boundaries**: each visit's
  deepest per-pixel stimulus becomes the next visit's prior-fluence
  map (the PersistenceConfig.prior_fluence_file seam), so visit N
  opens with visit N-1's afterglow decaying through its first orbit
  (the classic repeated-program WFC3 systematic);
- **per-visit ephemeris drift**: the TRUE transit times walk away
  from the assumed linear ephemeris by ``t0_drift_s_per_visit`` per
  visit while the YAML t0 the reducer assumes stays put — multi-visit
  programs exist to measure exactly this class of signal.

The carried stimulus is the per-pixel MAX of the visit's noise-free
fluence stack (trap filling is what persists, and the sigmoid stimulus
response saturates — the deepest fill, not the sum, is the physical
carrier), stamped with the visit's end time; the next visit receives it
with an end time on its own clock (negative seconds before its first
exposure). The decay tensordot (ops/persistence.py) then weights it
like any other prior stimulus.

Each visit is an ordinary :class:`~wayne_tpu.observation.Observation`
in its own subdirectory (``visit_00/ visit_01/ ...``) — resumable,
reducible and retrievable with every existing tool, visit by visit.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Callable

import numpy as np

from wayne_tpu.config import ObservationConfig

SECONDS_PER_DAY = 86400.0


def visit_start_mjds(cfg: ObservationConfig) -> list[float]:
    """The program's visit start epochs.

    Explicit ``visit_start_mjds`` wins; otherwise visits repeat every
    ``visit_spacing_days``, defaulting (0) to the nearest whole number
    of planet periods at least one day long — consecutive transits as
    a real phase-folded program would schedule them.
    """
    prog = cfg.program
    if prog.visit_start_mjds is not None:
        starts = [float(v) for v in prog.visit_start_mjds]
        if len(starts) != prog.num_visits:
            raise ValueError(
                f"program.visit_start_mjds has {len(starts)} entries "
                f"for num_visits={prog.num_visits}")
        return starts
    spacing = float(prog.visit_spacing_days)
    if spacing <= 0.0:
        period = float(cfg.planet.period_days)
        spacing = period * max(1, int(np.ceil(1.0 / period)))
    return [cfg.start_mjd + i * spacing for i in range(prog.num_visits)]


def visit_config(cfg: ObservationConfig, index: int,
                 starts: list[float] | None = None) -> ObservationConfig:
    """The i-th visit's single-visit config.

    Shifts ``start_mjd`` to the visit epoch and applies the TRUE
    ephemeris drift: the simulated planet's t0 moves by
    ``t0_drift_s_per_visit * index`` while the config the reducer
    reads keeps the original value — callers reducing visit i against
    this config experience exactly the stale-ephemeris systematic.
    Explicit per-exposure schedules (exp_start_mjd_list) are shifted
    wholesale by the visit offset.
    """
    starts = visit_start_mjds(cfg) if starts is None else starts
    new_start = starts[index]
    planet = cfg.planet
    drift_d = (cfg.program.t0_drift_s_per_visit * index
               / SECONDS_PER_DAY)
    if drift_d:
        planet = dataclasses.replace(
            planet, t0_mjd=planet.t0_mjd + drift_d)
    explicit = cfg.exp_start_mjd_list
    if explicit is not None:
        off = new_start - cfg.start_mjd
        explicit = tuple(t + off for t in explicit)
    return dataclasses.replace(
        cfg, start_mjd=new_start, exp_start_mjd_list=explicit,
        planet=planet, seed=cfg.seed + 104729 * index,
        program=dataclasses.replace(cfg.program, num_visits=1))


class Program:
    """Drive a multi-visit observing program (``program:`` YAML block)."""

    CARRY_FILE = "carry_fluence.npy"
    CARRY_META = "carry_fluence.json"

    def __init__(self, cfg: ObservationConfig):
        if cfg.program.num_visits < 1:
            raise ValueError("program.num_visits must be >= 1")
        self.cfg = cfg
        self.starts = visit_start_mjds(cfg)
        self.carry = (cfg.program.carry_persistence
                      and cfg.persistence.enabled
                      and cfg.program.num_visits > 1)

    def visit_dirs(self, outdir: str) -> list[str]:
        return [os.path.join(outdir, f"visit_{i:02d}")
                for i in range(self.cfg.program.num_visits)]

    def generate(self, outdir: str, chunk: int = 8,
                 progress: Callable[[str], None] | None = None,
                 resume: bool = True, debug: bool = False) -> list[list[str]]:
        """Simulate every visit; returns per-visit written paths."""
        from wayne_tpu.observation import Observation

        say = progress if progress is not None else (lambda s: None)
        os.makedirs(outdir, exist_ok=True)
        all_paths: list[list[str]] = []
        summary = {"visits": []}
        vdirs = self.visit_dirs(outdir)
        for i, vdir in enumerate(vdirs):
            vcfg = visit_config(self.cfg, i, self.starts)
            if self.carry and i > 0:
                # visit i-1's iteration always wrote these this run
                prev = vdirs[i - 1]
                carry_map = os.path.join(prev, self.CARRY_FILE)
                meta = json.load(open(os.path.join(prev,
                                                   self.CARRY_META)))
                # prior end on THIS visit's clock (negative: before it)
                prior_end_s = ((meta["end_mjd"] - vcfg.start_mjd)
                               * SECONDS_PER_DAY)
                if prior_end_s >= 0.0:
                    raise ValueError(
                        f"visit {i} starts (MJD {vcfg.start_mjd}) before "
                        f"visit {i - 1} ended (MJD {meta['end_mjd']})")
                vcfg = dataclasses.replace(
                    vcfg, persistence=dataclasses.replace(
                        vcfg.persistence, prior_fluence_file=carry_map,
                        prior_end_s=float(prior_end_s)))
            say(f"visit {i + 1}/{self.cfg.program.num_visits} "
                f"(MJD {vcfg.start_mjd:.4f})")
            obs = Observation(vcfg)
            paths = obs.generate(vdir, chunk=chunk, resume=resume,
                                 progress=progress, debug=debug)
            all_paths.append(paths)
            entry = {"dir": os.path.basename(vdir),
                     "start_mjd": vcfg.start_mjd,
                     "true_t0_mjd": float(vcfg.planet.t0_mjd),
                     "n_written": len(paths)}
            if self.carry:
                entry["carry"] = self._save_carry(
                    obs, vdir, chunk,
                    reuse=resume and len(paths) == 0)
            summary["visits"].append(entry)
        summary["assumed_t0_mjd"] = float(self.cfg.planet.t0_mjd)
        summary["t0_drift_s_per_visit"] = float(
            self.cfg.program.t0_drift_s_per_visit)
        with open(os.path.join(outdir, "program_summary.json"), "w") as fh:
            json.dump(summary, fh, indent=2)
        return all_paths

    def _save_carry(self, obs, vdir: str, chunk: int,
                    reuse: bool = False) -> dict:
        """Write the visit's carried stimulus: per-pixel max fluence
        (noise-free stack — what filled the traps) + its end epoch.

        ``reuse``: a fully-resumed visit (no files written) whose carry
        products already exist skips the fluence recomputation — the
        stimulus is a deterministic function of the config, so the
        on-disk copy is exact, and a no-op program resume stays O(1)
        instead of paying one noise-free visit simulation per visit.
        The on-disk copy is only trusted when its stamped config
        fingerprint matches this visit's config: editing the YAML and
        resuming into the same outdir must not feed visit N a stale
        prior-fluence map.
        """
        import jax.numpy as jnp

        # ObservationConfig is a plain nested dataclass of scalars/
        # strings/tuples, so repr() is a deterministic serialisation.
        cfg_sha = hashlib.sha256(repr(obs.cfg).encode()).hexdigest()[:16]
        meta_path = os.path.join(vdir, self.CARRY_META)
        if (reuse and os.path.exists(meta_path)
                and os.path.exists(os.path.join(vdir, self.CARRY_FILE))):
            meta = json.load(open(meta_path))
            if meta.get("config_sha") == cfg_sha:
                return meta

        stack = obs._visit_fluence(chunk)              # (N, S, S)
        carried = np.asarray(jnp.max(stack, axis=0), np.float32)
        exptime = float(obs.tables.read_times[-1])
        end_s = float(np.asarray(obs.scenes.exp_start_s)[-1]) + exptime
        end_mjd = obs.cfg.start_mjd + end_s / SECONDS_PER_DAY
        np.save(os.path.join(vdir, self.CARRY_FILE), carried)
        meta = {"end_mjd": end_mjd,
                "peak_fluence_e": float(carried.max()),
                "mean_fluence_e": float(carried.mean()),
                "config_sha": cfg_sha}
        with open(os.path.join(vdir, self.CARRY_META), "w") as fh:
            json.dump(meta, fh, indent=2)
        return meta
