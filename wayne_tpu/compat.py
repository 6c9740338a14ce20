"""Reference-style API shims (reference: wayne's public entry points).

Users coming from the reference find the same names here:

  - :func:`run` — ``wayne.run_visit.run(parameter_file)`` equivalent;
  - :class:`ExposureGenerator` — per-exposure ``staring_frame`` /
    ``scanning_frame`` calls (reference: wayne/exposure_generator.py),
    returning the sampled read stack; internally one call into the fused
    device kernel.

The native wayne_tpu API (Observation / simulate_visit / Scene) is the
recommended surface — these shims exist so reference-shaped scripts port
without rewrites. Exact reference signatures could not be verified (the
reference mount was empty, SURVEY.md provenance); the shims accept the
documented parameter set by keyword.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.config import ExposureStatic, NoiseFlags
from wayne_tpu.models.grism import Grism, make_grism
from wayne_tpu.ops.exposure import ExposureResult, simulate_exposure
from wayne_tpu.ops.kepler import OrbitParams
from wayne_tpu.scene import Scene
from wayne_tpu.trends import TrendParams


def run(parameter_file: str, outdir: str | None = None,
        chunk: int = 8) -> list[str]:
    """Reference CLI equivalent: load a YAML parameter file, generate the
    visit, write FITS products. Returns written paths."""
    from wayne_tpu.config import load_yaml
    from wayne_tpu.observation import Observation

    cfg = load_yaml(parameter_file)
    obs = Observation(cfg)
    return obs.generate(outdir or cfg.outdir, chunk=chunk)


class ExposureGenerator:
    """Per-exposure generator with the reference's frame methods."""

    def __init__(self, grism: Grism | str = "G141", *, subarray: int = 512,
                 n_lambda: int = 512, nsamp: int = 15,
                 samp_seq: str = "SPARS10", n_sub: int = 8,
                 noise: NoiseFlags | None = None,
                 stellar_flux: np.ndarray | None = None,
                 rp_over_rs: np.ndarray | float = 0.0,
                 ld_coeffs=(0.65, -0.25, 0.45, -0.2),
                 orbit: OrbitParams | None = None,
                 sky_level: float = 1.2, seed: int = 0):
        if isinstance(grism, str):
            grism = make_grism(grism, subarray=subarray, n_lambda=n_lambda,
                               samp_seq=samp_seq, nsamp=nsamp)
        else:
            # a pre-built Grism instance carries its own geometry — the
            # ExposureStatic must match its tables, or the kernel
            # applies (e.g.) 256^2 detector maps to a 512^2 frame
            subarray, n_lambda = grism.subarray, grism.n_lambda
            samp_seq, nsamp = grism.samp_seq, grism.nsamp
        self.grism = grism
        self.tables = grism.tables
        self.noise = noise if noise is not None else NoiseFlags()
        self.nsamp, self.samp_seq, self.n_sub = nsamp, samp_seq, n_sub
        self.subarray, self.n_lambda = subarray, n_lambda
        self._n_calls = 0
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        nl = self.tables.wl_centers.shape[0]
        if stellar_flux is None:
            stellar_flux = np.full(nl, 3.13e-10)
        self._template = Scene(
            x_ref=f32(subarray / 4), y_ref=f32(subarray / 4),
            exp_start_s=f32(0.0), orbit_start_s=f32(0.0),
            is_first_orbit=f32(1.0), scan_speed=f32(0.0),
            stellar_flux=f32(np.broadcast_to(stellar_flux, (nl,))),
            rp_over_rs=f32(np.broadcast_to(rp_over_rs, (nl,))),
            fp_over_fs=jnp.zeros(nl, jnp.float32),
            phase_amp=f32(0.0), phase_offset=f32(0.0),
            ld=f32(np.asarray(ld_coeffs)),
            orbit=orbit if orbit is not None else OrbitParams.create(
                86400.0, 1e7, 10.0, jnp.pi / 2),   # far-from-transit default
            trends=TrendParams.create(),
            sky_level=f32(sky_level), key=jax.random.PRNGKey(seed))

    def _config(self, scan: bool) -> ExposureStatic:
        return ExposureStatic(
            subarray=self.subarray, n_lambda=self.n_lambda, n_sub=self.n_sub,
            nsamp=self.nsamp, samp_seq=self.samp_seq, scan=scan,
            noise=self.noise)

    def _frame(self, scan: bool, x_ref, y_ref, scan_speed, exp_start_s,
               seed) -> ExposureResult:
        f32 = jnp.float32
        if seed is not None:
            key = jax.random.PRNGKey(seed)
        else:
            # reference semantics: each call advances the RNG — reusing
            # the template key verbatim would hand every seedless call
            # the bit-identical noise realisation
            key = jax.random.fold_in(self._template.key, self._n_calls)
            self._n_calls += 1
        scene = dataclasses.replace(
            self._template, x_ref=f32(x_ref), y_ref=f32(y_ref),
            scan_speed=f32(scan_speed), exp_start_s=f32(exp_start_s),
            key=key)
        return simulate_exposure(scene, self.tables, self._config(scan))

    def staring_frame(self, x_ref: float, y_ref: float,
                      exp_start_s: float = 0.0,
                      seed: int | None = None) -> ExposureResult:
        """Staring-mode exposure (reference: ExposureGenerator.staring_frame)."""
        return self._frame(False, x_ref, y_ref, 0.0, exp_start_s, seed)

    def scanning_frame(self, x_ref: float, y_ref: float,
                       scan_speed: float = 1.0, exp_start_s: float = 0.0,
                       seed: int | None = None) -> ExposureResult:
        """Spatial-scan exposure (reference: ExposureGenerator.scanning_frame)."""
        return self._frame(True, x_ref, y_ref, scan_speed, exp_start_s, seed)
