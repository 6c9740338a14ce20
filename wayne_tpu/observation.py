"""Visit orchestration (reference: wayne/observation.py :: Observation).

Builds every host-side input (calibration tables, stellar/planet spectra
on the instrument grid, visit plan, per-exposure pointing drift and scan
direction, RNG keys), stacks them into a batched Scene, runs the device
visit program in chunks, and streams ima-style FITS files to disk.

Device/host boundary (BASELINE north_star): everything from the dispersed
spectrum to the sampled reads happens on-device in one jitted program;
FITS assembly and file writes stay host-side, overlapped with the next
chunk's device compute (JAX dispatch is asynchronous).

Checkpoint/resume: each exposure lands in its own file, so an interrupted
visit resumes by skipping exposures whose outputs already exist — the same
incremental property the reference gets from its per-exposure writes.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ObservationConfig
from wayne_tpu.io.ima import default_primary_header, write_ima
from wayne_tpu.models.grism import make_calibrated_grism
from wayne_tpu.models.planet import Planet
from wayne_tpu.models.stellar import Star
from wayne_tpu.ops.visit import pad_scenes, simulate_visit
from wayne_tpu.scene import Scene
from wayne_tpu.trends import TrendParams
from wayne_tpu.visit_plan import HST_PERIOD_S, VisitPlan, plan_visit

log = logging.getLogger("wayne_tpu")


# The WFC3 IR ADC is 16-bit UNSIGNED: raw DNs span 0..65535 (saturated
# low-gain pixels exceed 32767, so int16 would flatten them at the wrong
# ceiling). One jitted converter, shape-cached by jax.
_quantize_u16 = jax.jit(
    lambda r: jnp.clip(jnp.round(r), 0.0, 65535.0).astype(jnp.uint16))


def _build_spots(star_cfg, wl_centers: np.ndarray):
    """StarConfig.spots -> ops/spots.SpotParams (or None).

    Each spot mapping needs lon_deg, lat_deg, radius (stellar radii) and
    EITHER temp_k (contrast = blackbody ratio vs the star's temperature
    per wavelength bin) OR an explicit grey ``contrast``. Host-side:
    runs once per Observation, like the rest of the scene build.
    """
    if not star_cfg.spots:
        return None
    from wayne_tpu.ops.spots import SpotParams
    from wayne_tpu.utils.spectra import blackbody_flam_um

    lat, lon, rad, contrast = [], [], [], []
    star_bb = blackbody_flam_um(wl_centers, star_cfg.temperature_k)
    for i, sp in enumerate(star_cfg.spots):
        if not isinstance(sp, dict):
            raise ValueError(f"star spots[{i}] must be a mapping, got "
                             f"{type(sp).__name__}")
        unknown = set(sp) - {"lon_deg", "lat_deg", "radius", "temp_k",
                             "contrast"}
        if unknown:
            raise ValueError(f"unknown spot keys {sorted(unknown)} in "
                             f"spots[{i}]")
        try:
            la = float(sp["lat_deg"])
            lo = float(sp["lon_deg"])
            r = float(sp["radius"])
        except KeyError as exc:
            raise ValueError(f"spots[{i}] missing key {exc}") from None
        if not -90.0 <= la <= 90.0:
            raise ValueError(f"spots[{i}] lat_deg {la} outside [-90, 90]")
        if not 0.0 < r < 1.0:
            raise ValueError(f"spots[{i}] radius {r} outside (0, 1)")
        if "contrast" in sp:
            c = np.full(wl_centers.size, float(sp["contrast"]))
            if not 0.0 <= float(sp["contrast"]) <= 1.5:
                raise ValueError(f"spots[{i}] contrast outside [0, 1.5]")
        elif "temp_k" in sp:
            t_spot = float(sp["temp_k"])
            if t_spot <= 0.0:
                raise ValueError(f"spots[{i}] temp_k must be positive")
            c = blackbody_flam_um(wl_centers, t_spot) / star_bb
        else:
            raise ValueError(f"spots[{i}] needs temp_k or contrast")
        lat.append(np.deg2rad(la))
        lon.append(np.deg2rad(lo))
        rad.append(r)
        contrast.append(c)
    rot = 0.0
    if star_cfg.rotation_period_d:
        rot = 2.0 * np.pi / (float(star_cfg.rotation_period_d) * 86400.0)
    return SpotParams.create(np.asarray(lat), np.asarray(lon),
                             np.asarray(rad),
                             np.stack(contrast).astype(np.float32), rot)


def _build_companions(cfg, wl_edges: np.ndarray):
    """ObservationConfig.companions -> scene.CompanionParams (or None).

    Each companion mapping needs dx_px, dy_px (direct-image offsets from
    the target's reference position) and a spectrum: ``temperature_k``
    (blackbody) or ``spectrum_file``, scaled by EITHER ``mag_j`` (its own
    J magnitude) OR ``flux_scale`` (its J-band flux as a fraction of a
    m_J = star.magnitude_j source — the convenient form for "a 1%
    contaminant"). Host-side, once per Observation.
    """
    if not cfg.companions:
        return None
    from wayne_tpu.config import StarConfig
    from wayne_tpu.models.stellar import Star
    from wayne_tpu.scene import CompanionParams

    allowed = {"dx_px", "dy_px", "temperature_k", "mag_j", "mag_J",
               "flux_scale", "spectrum_file"}
    dx, dy, flux = [], [], []
    for i, c in enumerate(cfg.companions):
        if not isinstance(c, dict):
            raise ValueError(f"companions[{i}] must be a mapping, got "
                             f"{type(c).__name__}")
        unknown = set(c) - allowed
        if unknown:
            raise ValueError(f"unknown companion keys {sorted(unknown)} "
                             f"in companions[{i}]; allowed: "
                             f"{sorted(allowed)}")
        try:
            dx.append(float(c["dx_px"]))
            dy.append(float(c["dy_px"]))
        except KeyError as exc:
            raise ValueError(
                f"companions[{i}] missing key {exc}") from None
        mag = c.get("mag_j", c.get("mag_J"))
        scale = c.get("flux_scale")
        if (mag is None) == (scale is None):
            raise ValueError(f"companions[{i}] needs exactly one of "
                             "mag_j or flux_scale (its brightness)")
        if scale is not None:
            if not float(scale) > 0.0:
                raise ValueError(f"companions[{i}] flux_scale must be "
                                 "positive")
            mag = cfg.star.magnitude_j - 2.5 * np.log10(float(scale))
        sc = StarConfig(name=f"companion{i}",
                        temperature_k=float(
                            c.get("temperature_k", cfg.star.temperature_k)),
                        magnitude_j=float(mag),
                        spectrum_file=c.get("spectrum_file"))
        flux.append(Star(sc).flux_on_grid(wl_edges))
    f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    return CompanionParams(dx_px=f32(dx), dy_px=f32(dy),
                           flux=f32(np.stack(flux)))


def _load_fluence_map(path: str) -> np.ndarray:
    """Host-side (S, S) fluence map loader: .npy or FITS (first image
    HDU). Used for PersistenceConfig.prior_fluence_file."""
    if path.endswith(".npy"):
        return np.asarray(np.load(path), np.float32)
    from wayne_tpu.io.fits import read_fits

    for _, data in read_fits(path):
        if data is not None and np.ndim(data) == 2:
            return np.asarray(data, np.float32)
    raise ValueError(f"{path!r} contains no 2-D image HDU")


class Observation:
    """One simulated WFC3 IR grism visit."""

    def __init__(self, cfg: ObservationConfig):
        from wayne_tpu.calibration import sequence_tables_scope

        self.cfg = cfg
        # Every timing-dependent derivation happens inside the sequence
        # scope: the grism's read_times, the static auto-sizers (band,
        # CR bound, subsegments — they consult sample_sequence_times)
        # and the visit plan all see the loaded table, and nothing leaks
        # to later visits in this process.
        with sequence_tables_scope(cfg.calibration.sequence_file):
            self.grism = make_calibrated_grism(cfg)
            self.static = cfg.exposure_static()
            self.tables: Tables = self.grism.tables
            self.detector_exptime = float(self.tables.read_times[-1])
            if cfg.exp_start_mjd_list:
                # Explicit schedule: EXPSTARTs reproduce the list exactly.
                from wayne_tpu.visit_plan import plan_from_start_times
                self.plan: VisitPlan = plan_from_start_times(
                    cfg.exp_start_mjd_list, self.detector_exptime)
            else:
                self.plan = plan_visit(
                    cfg.n_orbits, self.detector_exptime,
                    cfg.exposure_overhead_s, cfg.start_mjd,
                    cfg.exposures_per_orbit, first_orbit_trim=5 * 60.0)
        self.star = Star(cfg.star)
        # plan.start_mjd: cfg.start_mjd for the cadence planner, the first
        # list entry for an explicit exp_start_mjd_list schedule.
        self.planet = Planet(cfg.planet, visit_start_mjd=self.plan.start_mjd)
        self.scenes = self._build_scenes()
        self._warn_if_off_detector()

    def _warn_if_off_detector(self) -> None:
        """Warn when the dispersed spectrum misses the subarray for ANY
        exposure of the visit.

        The default reference position suits 512^2; on smaller subarrays a
        stale x_ref/y_ref silently produces sky-only frames. The check
        covers the whole per-exposure pointing series — a drift or shift
        list that walks the spectrum off the detector mid-visit is caught
        even when exposure 0 lands fine.
        """
        from wayne_tpu.ops.dispersion import trace_params, trace_y, wl_to_x

        cfg = self.cfg
        wl_ends = jnp.asarray(
            np.asarray(self.tables.wl_centers)[[0, -1]], jnp.float32)

        def ends(x_ref, y_ref):
            tp = trace_params(self.tables, x_ref, y_ref)
            x = wl_to_x(wl_ends, tp)
            return x, trace_y(x[0], tp)

        x_all, y0_all = jax.vmap(ends)(self.scenes.x_ref, self.scenes.y_ref)
        x_all, y0_all = np.asarray(x_all), np.asarray(y0_all)   # (n, 2), (n,)
        speed = np.asarray(self.scenes.scan_speed)
        y_end = y0_all + speed * self.detector_exptime
        y_lo = np.minimum(y0_all, y_end)
        y_hi = np.maximum(y0_all, y_end)
        S = cfg.subarray
        off = ((x_all.max(axis=1) < 0) | (x_all.min(axis=1) >= S)
               | (y_hi < -3) | (y_lo >= S + 3))
        if off.any():
            i = int(np.argmax(off))
            log.warning(
                "spectrum lands outside the %dx%d subarray for %d/%d "
                "exposures (first at exposure %d: columns %.0f..%.0f, "
                "rows %.0f..%.0f for x_ref=%.1f, y_ref=%.1f): those "
                "frames will contain background only",
                S, S, int(off.sum()), off.size, i,
                x_all[i].min(), x_all[i].max(), y_lo[i], y_hi[i],
                float(np.asarray(self.scenes.x_ref)[i]),
                float(np.asarray(self.scenes.y_ref)[i]))
            return
        # Partial clipping: the trace crosses the edge.  The full G141
        # first order spans ~137 px, so subarrays <= 256 ALWAYS clip
        # some bandpass (the standard 128 px/x_ref=30 layout keeps
        # ~41% — fine, that's how the subarray modes work).  Warn only
        # when under a quarter survives: those slivers reduce to
        # garbage depths downstream (seen in practice: x_ref=15 on a
        # 64 px subarray leaves 6 px of trace on-detector).
        x_lo, x_hi = x_all.min(axis=1), x_all.max(axis=1)
        span = np.maximum(x_hi - x_lo, 1.0)
        on = np.clip(x_hi, 0, S) - np.clip(x_lo, 0, S)
        clipped = on < 0.25 * span
        if clipped.any():
            i = int(np.argmax(clipped))
            log.warning(
                "spectrum is mostly clipped by the %dx%d subarray for "
                "%d/%d exposures (first at exposure %d: trace spans "
                "columns %.0f..%.0f, only %.0f px on-detector for "
                "x_ref=%.1f): move x_ref or enlarge the subarray",
                S, S, int(clipped.sum()), clipped.size, i,
                x_lo[i], x_hi[i], on[i],
                float(np.asarray(self.scenes.x_ref)[i]))

    # ------------------------------------------------------------------
    def _build_scenes(self) -> Scene:
        cfg, plan = self.cfg, self.plan
        n = plan.n_exposures
        rng = np.random.RandomState(cfg.seed)
        tr = cfg.trends

        # Pointing drift: slow linear drift + per-exposure jitter
        # (reference: wayne/trend_generators x/y shift classes).
        idx = np.arange(n)

        def offsets(shift_list, rate):
            # Explicit per-exposure offsets always apply — they are user
            # data, not a noise source, so the pointing_drift flag only
            # gates the generated drift+jitter model.
            if shift_list is not None:
                xs = np.asarray(shift_list, np.float64)
                if xs.size < n:
                    raise ValueError(
                        f"shift list has {xs.size} entries; visit has "
                        f"{n} exposures")
                return xs[:n]
            if not cfg.noise.pointing_drift:
                return np.zeros(n)
            return rate * idx + tr.drift_jitter * rng.standard_normal(n)

        x_ref = cfg.x_ref + offsets(tr.x_shift_list, tr.drift_x_per_exp)
        y_ref = cfg.y_ref + offsets(tr.y_shift_list, tr.drift_y_per_exp)
        # Orbital-phase-locked pointing drift (beyond the reference's
        # linear model): thermal flexure repeats each HST orbit — the
        # dominant short-timescale x-shift structure in real scan
        # visits. Deterministic (no RNG draw), so enabling it never
        # reshuffles existing visits' jitter/SSV streams; gated by the
        # same pointing_drift flag as the linear drift model.
        if cfg.noise.pointing_drift and (tr.drift_orbit_amp_x
                                         or tr.drift_orbit_amp_y):
            ph = (2.0 * np.pi
                  * (np.asarray(plan.exp_start_s, np.float64)
                     - np.asarray(plan.orbit_start_s, np.float64))
                  / HST_PERIOD_S + np.deg2rad(tr.drift_orbit_phase_deg))
            x_ref = x_ref + tr.drift_orbit_amp_x * np.sin(ph)
            y_ref = y_ref + tr.drift_orbit_amp_y * np.sin(ph)

        # Scan direction alternation: reverse scans start at the far end
        # and sweep back (real WFC3 forward/reverse visits).
        speed = np.full(n, cfg.scan_speed_pix_s if cfg.scan else 0.0)
        reverse = np.zeros(n, bool)
        if cfg.scan and cfg.alternate_scan_direction:
            reverse = idx % 2 == 1
            speed[reverse] *= -1.0
            y_ref = y_ref + np.where(
                reverse, abs(cfg.scan_speed_pix_s) * self.detector_exptime, 0.0)
        # Upstream/downstream effect: the two scan directions have slightly
        # different effective exposure times (real WFC3 forward/reverse
        # visits show a ~0.1-1% flux offset between directions, removed in
        # reduction by per-direction normalisation). Source flux is linear
        # in the spectrum, so a host-side per-exposure scale is exact.
        flux_fac = np.ones(n)
        if tr.reverse_flux_offset:
            if not (cfg.scan and cfg.alternate_scan_direction):
                raise ValueError(
                    "trends.reverse_flux_offset needs scan: true and "
                    "alternate_scan_direction: true (there are no "
                    "reverse-scan exposures to offset)")
            flux_fac = np.where(reverse, 1.0 + tr.reverse_flux_offset, 1.0)

        wl_edges = np.asarray(self.tables.wl_edges, np.float64)
        wl_centers = np.asarray(self.tables.wl_centers, np.float64)
        stellar = self.star.flux_on_grid(wl_edges)
        rp = self.planet.rp_on_grid(wl_centers)
        fp = self.planet.fp_on_grid(wl_centers)
        ld = self.planet.ld_on_grid(wl_centers)   # (4,) or (NL, 4)
        spots = _build_spots(cfg.star, wl_centers)
        comps = _build_companions(cfg, wl_edges)

        ssv_phases = rng.uniform(0, 2 * np.pi, n)  # SSV phase varies per exp
        trends = TrendParams.create(
            ssv_amp=tr.ssv_amplitude, ssv_period_s=tr.ssv_period_s,
            ssv_rw_amp=tr.ssv_rw_amplitude,
            visit_slope_per_s=tr.visit_slope_per_day / 86400.0,
            hook_amp=tr.hook_amplitude, hook_tau_s=tr.hook_timescale_s,
            hook_orbit1_scale=tr.hook_orbit1_scale)
        trends_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,)), trends)
        trends_b = dataclasses.replace(
            trends_b, ssv_phase=jnp.asarray(ssv_phases, jnp.float32))

        orbit = self.planet.orbit_params()
        orbit_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n,)), orbit)

        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed), i))(jnp.arange(n))

        # Intra-orbit environmental systematics (beyond the reference).
        # Drawn AFTER every stream above so enabling them never reshuffles
        # the drift/jitter/SSV-phase draws of existing visits.
        orbit_phase = (2.0 * np.pi
                       * (np.asarray(plan.exp_start_s)
                          - np.asarray(plan.orbit_start_s)) / HST_PERIOD_S)
        psf_scale = None
        if tr.breathing_amp:
            # HST focus breathing: thermal PSF-width cycle at the orbital
            # period (synthetic sinusoid shape; amplitude ~1-2% real).
            psf_scale = 1.0 + tr.breathing_amp * np.sin(
                orbit_phase + tr.breathing_phase)
        sky = np.full(n, cfg.sky_level)
        if tr.sky_orbit_amp:
            # Earthshine/airglow rise toward the bright limb ends of the
            # visibility window (synthetic cosine shape, mean-preserving
            # over a full cycle).
            sky = sky * (1.0 + tr.sky_orbit_amp * np.cos(orbit_phase))
        if tr.sky_scatter:
            sky = sky * (1.0 + tr.sky_scatter * rng.standard_normal(n))
        sky = np.maximum(sky, 0.0)
        # He 1.083 um airglow: a second, separately-scaled sky component
        # (its own spatial frame, Tables.sky_he_frame). Strongly
        # time-variable: peaks at orbit start (bright limb) and falls to
        # ~0 in shadow (synthetic clipped-cosine shape). Drawn AFTER the
        # sky scatter so enabling it never reshuffles existing streams.
        sky_he = None
        if tr.he_airglow_level:
            he = tr.he_airglow_level * np.maximum(np.cos(orbit_phase), 0.0)
            if tr.he_airglow_scatter:
                he = he * (1.0 + tr.he_airglow_scatter
                           * rng.standard_normal(n))
            sky_he = np.maximum(he, 0.0)

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        bcast = lambda v: jnp.broadcast_to(f32(v), (n,) + np.shape(v)[1:])
        return Scene(
            x_ref=f32(x_ref), y_ref=f32(y_ref),
            exp_start_s=f32(plan.exp_start_s),
            orbit_start_s=f32(plan.orbit_start_s),
            is_first_orbit=f32(plan.orbit_index == 0),
            scan_speed=f32(speed),
            stellar_flux=f32(flux_fac[:, None] * stellar[None, :]),
            rp_over_rs=jnp.broadcast_to(f32(rp), (n, rp.size)),
            fp_over_fs=jnp.broadcast_to(f32(fp), (n, fp.size)),
            phase_amp=jnp.broadcast_to(
                f32(cfg.planet.phase_amplitude), (n,)),
            phase_offset=jnp.broadcast_to(
                f32(np.deg2rad(cfg.planet.phase_offset_deg)), (n,)),
            ld=jnp.broadcast_to(f32(ld), (n,) + ld.shape),
            orbit=orbit_b, trends=trends_b,
            sky_level=f32(sky),
            sky_he_level=None if sky_he is None else f32(sky_he),
            key=keys,
            psf_scale=None if psf_scale is None else f32(psf_scale),
            spots=(None if spots is None else jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape), spots)),
            companions=(None if comps is None else dataclasses.replace(
                jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x, (n,) + x.shape), comps),
                # companions are scanned sources too: the direction-
                # dependent effective exposure time scales them equally
                flux=f32(flux_fac[:, None, None]
                         * np.asarray(comps.flux)[None]))),
        )

    # ------------------------------------------------------------------
    def _visit_fluence(self, chunk: int = 8):
        """The visit's noise-free fluence stack, computed at most once.

        Both charge-memory models (persistence afterglow + RECTE traps)
        are driven by the same stimulus — the ideal accumulation plus
        the flag-enabled background (ops/visit.visit_fluence_stack).
        Sharing one cached stack means enabling BOTH models costs one
        physics-only pass of the visit, not two. The cache is valid
        because the stack is independent of the persist_rate/trap_mult
        leaves later attached to the Scenes (persistence joins the
        background rate, never ideal_e; trap_mult is None during the
        stimulus pass).
        """
        if getattr(self, "_fluence_stack", None) is None:
            from wayne_tpu.ops.visit import visit_fluence_stack

            self._fluence_stack = visit_fluence_stack(
                self.scenes, self.tables, self.static, chunk)
        return self._fluence_stack

    # ------------------------------------------------------------------
    def _ensure_persistence(self, chunk: int = 8) -> None:
        """Attach per-exposure image-persistence maps to the Scenes.

        Lazy: runs once per Observation, only when ``persistence:`` is
        enabled — one noise-free pass of the visit drives the stimulus
        stack (shared with RECTE via :meth:`_visit_fluence`), then the
        decay tensordot yields every exposure's rate map
        (ops/persistence.py). The maps ride the Scene pytree, so the
        chunked/sharded visit machinery needs no other change.
        """
        pcfg = self.cfg.persistence
        if not pcfg.enabled or self.scenes.persist_rate is not None:
            return
        from wayne_tpu.ops.persistence import visit_persistence_rates

        extras: list = []
        ends: list = []
        if pcfg.prior_fluence_file:
            # Afterglow from the PREVIOUS observation (the "persistence
            # from the prior program" systematic): a user-supplied
            # (S, S) fluence map of the prior target's last exposure.
            prior = _load_fluence_map(pcfg.prior_fluence_file)
            S = self.static.subarray
            if prior.shape != (S, S):
                raise ValueError(
                    f"prior_fluence_file {pcfg.prior_fluence_file!r} is "
                    f"{prior.shape}, expected ({S}, {S}) for this subarray")
            extras.append(jnp.asarray(prior, jnp.float32))
            ends.append(float(pcfg.prior_end_s))
        if pcfg.direct_image:
            # The visit-opening direct image concentrates the star's
            # whole filter bandpass into one PSF spot — the strongest
            # persistence stimulus of the visit (saturates for bright
            # targets). Its ideal fluence leads the stimulus stack,
            # ending di_gap_s before the first grism exposure.
            res_di, tab_di, _ = self.simulate_direct_image(ideal=True)
            di_exptime = float(tab_di.read_times[-1])
            # same flag gating as visit_fluence_stack: only enabled
            # background components actually arrive as charge
            bg_di = 0.0
            if self.static.noise.sky:
                bg_di = bg_di + self.scenes.sky_level[0] * tab_di.sky_frame
            if self.static.noise.dark:
                bg_di = bg_di + tab_di.dark_map
            extras.append(res_di.ideal_e
                          + bg_di * di_exptime * tab_di.active_mask)
            ends.append(float(np.asarray(self.scenes.exp_start_s)[0])
                        - pcfg.di_gap_s)
        rates = visit_persistence_rates(
            self.scenes, self.tables, self.static, pcfg, chunk=chunk,
            extra_fluence=jnp.stack(extras) if extras else None,
            extra_end_s=jnp.asarray(ends, jnp.float32) if ends else None,
            fluence_stack=self._visit_fluence(chunk))
        self.scenes = dataclasses.replace(self.scenes, persist_rate=rates)

    # ------------------------------------------------------------------
    def _ensure_recte(self, chunk: int = 8) -> None:
        """Attach RECTE charge-trap maps to the Scenes (ops/recte.py).

        Lazy, once per Observation, only when ``recte:`` is enabled.
        Must run AFTER :meth:`_ensure_persistence`: the trap RELEASE
        rate is real arriving charge and joins the persistence rate
        leaf, while the capture side rides the multiplicative
        ``trap_mult`` leaf. Shares the persistence model's stimulus
        stack (:meth:`_visit_fluence`) — enabling both costs ONE
        noise-free pass of the visit.
        """
        rcfg = self.cfg.recte
        if not rcfg.enabled or self.scenes.trap_mult is not None:
            return
        from wayne_tpu.ops.recte import visit_trap_maps

        trap_mult, release = visit_trap_maps(
            self.scenes, self.tables, self.static, rcfg, chunk=chunk,
            fluence_stack=self._visit_fluence(chunk))
        persist = self.scenes.persist_rate
        persist = release if persist is None else persist + release
        self.scenes = dataclasses.replace(
            self.scenes, trap_mult=trap_mult, persist_rate=persist)

    # ------------------------------------------------------------------
    def simulate(self, chunk: int = 8):
        """Run the entire visit on-device; returns batched ExposureResult."""
        self._ensure_persistence(chunk)
        self._ensure_recte(chunk)
        scenes, n = pad_scenes(self.scenes, chunk)
        out = simulate_visit(scenes, self.tables, self.static, chunk)
        return jax.tree_util.tree_map(lambda x: x[:n], out)

    # ------------------------------------------------------------------
    def generate(self, outdir: str | None = None, chunk: int = 8,
                 progress: Callable[[str], None] | None = None,
                 resume: bool = True, debug: bool = False,
                 mesh=None) -> list[str]:
        """Simulate and write the visit to ima-style FITS files.

        Overlaps host FITS writing of chunk i with device compute of
        chunk i+1 via JAX's async dispatch. Returns written paths.
        ``debug=True`` runs NaN/range guards on every chunk and writes a
        structured visit summary (SURVEY.md section 5.5).

        ``mesh``: an optional jax.sharding.Mesh — the visit's exposure
        axis is sharded over ALL its devices (``chunk`` exposures per
        device per step, no collectives; ops/visit.py::
        simulate_visit_sharded), and the host gathers each step's frames
        for writing. Files are identical to the single-device path —
        every exposure's program and key are position-independent.
        """
        cfg = self.cfg
        outdir = outdir or cfg.outdir
        os.makedirs(outdir, exist_ok=True)
        say = progress or (lambda s: log.info("%s", s))
        self._debug = debug
        # Debug guards validate the noise-free ideal_e frame, so the debug
        # path pays to materialise it; production skips it (~10% faster).
        static = (dataclasses.replace(self.static, compute_ideal=True)
                  if debug else self.static)
        self._summary: dict = {"exposures": [], "config": cfg.grism}

        self._write_direct_image(outdir, resume=resume)
        self._ensure_persistence(chunk)
        self._ensure_recte(chunk)

        # With a mesh, one device-step computes chunk exposures on EACH
        # device; the host loop advances by the group size.
        n_dev = int(mesh.devices.size) if mesh is not None else 1
        step = chunk * n_dev
        scenes, n = pad_scenes(self.scenes, step)
        n_padded = jax.tree_util.tree_leaves(scenes)[0].shape[0]
        read_times = np.asarray(self.tables.read_times, np.float64)
        gain = float(self.tables.gain)
        rn = float(self.tables.read_noise_e)
        t_start = time.time()

        # Three-stage pipeline: device compute (async dispatch) ->
        # device->host transfer (main thread; starts early via
        # copy_to_host_async) -> FITS assembly + disk writes (one worker
        # thread; ctypes/native IO releases the GIL). On a tunneled TPU
        # the transfer is the bottleneck, so overlapping the writes with
        # the next chunk's transfer is a real wall-clock win.
        from concurrent.futures import ThreadPoolExecutor

        def fetch(res):
            if cfg.quantize_adc:
                # Quantize ON DEVICE before the async host copy so only
                # uint16 crosses the link. (Round 2 quantized at fetch
                # time, AFTER copy_to_host_async had already shipped the
                # f32 planes — the 'optimized' path moved 1.5x the bytes
                # and measured slower; BENCH_r02 0.76 vs 0.87 exp/s.)
                res = dataclasses.replace(res, reads_dn=_quantize_u16(
                    res.reads_dn))
            for leaf in (res.reads_dn, res.cr_pos, res.cr_count,
                         res.saturated_frac):
                try:
                    leaf.copy_to_host_async()
                except Exception:  # pragma: no cover - backend-dependent
                    pass
            return res

        futures = []
        with ThreadPoolExecutor(max_workers=1) as writer:
            pending: list[tuple[int, object]] = []
            for c0 in range(0, n_padded, step):
                if resume and c0 < n and all(
                        os.path.exists(self._exp_path(outdir, i))
                        for i in range(c0, min(c0 + step, n))):
                    continue   # whole chunk already on disk: skip compute
                sl = jax.tree_util.tree_map(lambda x: x[c0: c0 + step],
                                            scenes)
                if mesh is not None:
                    from wayne_tpu.ops.visit import simulate_visit_sharded
                    res = fetch(simulate_visit_sharded(
                        sl, self.tables, static, mesh, chunk))
                else:
                    res = fetch(simulate_visit(sl, self.tables, static,
                                               chunk))
                pending.append((c0, res))
                if len(pending) > 1:
                    c0p, resp = pending.pop(0)
                    host = self._fetch_chunk(resp)   # blocks on transfer
                    futures.append(writer.submit(
                        self._write_chunk, (c0p, host), outdir, n,
                        read_times, gain, rn, resume, say))
            while pending:
                c0p, resp = pending.pop(0)
                host = self._fetch_chunk(resp)
                futures.append(writer.submit(
                    self._write_chunk, (c0p, host), outdir, n, read_times,
                    gain, rn, resume, say))
        paths: list[str] = [p for f in futures for p in f.result()]
        wall = time.time() - t_start
        say(f"visit complete: {len(paths)} exposures in "
            f"{wall:.2f}s -> {outdir}")
        if self._debug:
            import json
            self._summary.update(
                n_exposures=n, wallclock_s=round(wall, 3),
                exptime_s=self.detector_exptime, grism=cfg.grism,
                nsamp=cfg.nsamp, samp_seq=cfg.samp_seq, scan=cfg.scan)
            with open(os.path.join(outdir, "visit_summary.json"), "w") as fh:
                json.dump(self._summary, fh, indent=2)
        return paths

    # ------------------------------------------------------------------
    def _exp_path(self, outdir: str, i: int) -> str:
        return os.path.join(outdir, f"{self.cfg.star.name}_{i:04d}_ima.fits")

    def _fetch_chunk(self, res):
        """Materialise the write-path outputs on host (one tunnel/PCIe
        transfer per chunk); ideal_e stays on device (only debug reads it).

        With quantize_adc the reads are rounded to integer DN on device
        (the detector's 16-bit ADC does exactly this) and cross the link
        as uint16 — half the bytes — then upcast on host so the FITS
        product keeps its layout.
        """
        # With quantize_adc the reads arrived as device uint16 (converted
        # in fetch() BEFORE the async copy); upcast host-side so the FITS
        # product keeps its f32 layout.
        reads_h = np.asarray(res.reads_dn)
        if reads_h.dtype != np.float32:
            reads_h = reads_h.astype(np.float32)
        return dataclasses.replace(
            res,
            reads_dn=reads_h,
            cr_pos=np.asarray(res.cr_pos),
            cr_count=np.asarray(res.cr_count),
            saturated_frac=np.asarray(res.saturated_frac))

    def _detector_planes(self):
        """Calibration-known detector DQ (hot/dead/blob/reference px) and
        the bias/gain planes the default ERR model propagates through
        (per-pixel maps when the corresponding noise flag wrote that
        structure into SCI; docs/API.md 'ERR model'). Cached — shared
        by the spectra chunks and the direct image so every product of
        the visit carries the same detector model."""
        if not hasattr(self, "_static_dq"):
            from wayne_tpu.io.ima import static_dq_plane

            self._static_dq = static_dq_plane(
                np.asarray(self.tables.dark_map),
                np.asarray(self.tables.active_mask),
                qe_map=np.asarray(self.tables.qe_map),
                rts_amp=(None if self.tables.rts_amp is None
                         else np.asarray(self.tables.rts_amp)))
            if not self._static_dq.any():
                self._static_dq = None
            self._bias_pedestal_e = (
                float(np.asarray(self.tables.bias_map).mean())
                if self.cfg.noise.bias else 0.0)
            self._gain_map = (
                np.asarray(self.tables.gain_map, np.float32)
                if self.cfg.noise.gain_variations else None)
            self._bias_e_map = (
                np.asarray(self.tables.bias_map, np.float32)
                if self.cfg.noise.bias else None)
        return (self._static_dq, self._bias_pedestal_e, self._gain_map,
                self._bias_e_map)

    def _exposure_dq(self, reads, gain, cr_pos, cr_count, tables):
        """Per-read DQ planes for one exposure (CR + static + saturation),
        the same recipe for spectra and the direct image."""
        from wayne_tpu.io.ima import cr_dq_planes, saturation_dq

        static_dq, _, _, _ = self._detector_planes()
        nr, s = reads.shape[0], reads.shape[1]
        cfg = self.cfg
        dq = (cr_dq_planes(cr_pos, cr_count, nr, s)
              if cfg.noise.cosmic_rays else None)
        if static_dq is not None:
            dq = (np.broadcast_to(static_dq, (nr, s, s)).copy()
                  if dq is None else dq | static_dq[None])
        if cfg.noise.non_linearity:   # saturation exists only then
            from wayne_tpu.calibration import nonlin_fw_deficit
            dq = saturation_dq(reads, gain, float(tables.full_well_e),
                               nonlin_fw_deficit(tables), dq)
        return dq

    def _write_chunk(self, item, outdir, n, read_times, gain, rn,
                     resume, say) -> list[str]:
        c0, res = item
        _, bias_ped, gain_map, bias_e_map = self._detector_planes()
        reads = np.asarray(res.reads_dn)   # (chunk, NR, S, S) device->host
        if getattr(self, "_debug", False):
            from wayne_tpu.utils.guards import check_exposure_result
            stats = check_exposure_result(res, context=f"chunk@{c0}")
            self._summary["exposures"].append(dict(chunk=c0, **stats))
        cr_pos = np.asarray(res.cr_pos)
        cr_count = np.asarray(res.cr_count)
        cfg = self.cfg
        paths = []
        for j in range(reads.shape[0]):
            i = c0 + j
            if i >= n:
                break
            path = self._exp_path(outdir, i)
            if resume and os.path.exists(path):
                continue
            dq = self._exposure_dq(reads[j], gain, cr_pos[j], cr_count[j],
                                   self.tables)
            primary = default_primary_header(
                targname=cfg.star.name, grism=cfg.grism, nsamp=cfg.nsamp,
                samp_seq=cfg.samp_seq, subarray=cfg.subarray,
                expstart_mjd=float(self.plan.exp_start_mjd()[i]),
                exptime_s=self.detector_exptime, scan=cfg.scan,
                scan_rate_pix_s=float(np.asarray(self.scenes.scan_speed)[i]),
                extra={"SIMSEED": cfg.seed, "EXPINDEX": i,
                       "SAT_FRAC": float(np.asarray(res.saturated_frac)[j]),
                       "PERSIST": bool(cfg.persistence.enabled),
                       # calwf3-style calibration switch: PERFORM means
                       # the detector chain applied the cubic
                       # non-linearity, so the reducer should invert it
                       # (reduction.linearize_reads); OMIT products are
                       # already linear and must NOT be "corrected".
                       "NLINCORR": ("PERFORM" if cfg.noise.non_linearity
                                    else "OMIT")})
            write_ima(path, reads[j], read_times, primary, gain=gain,
                      read_noise_e=rn, dq=dq,
                      bias_pedestal_e=bias_ped,
                      units=cfg.output_units,
                      gain_map=gain_map,
                      bias_e_map=bias_e_map)
            paths.append(path)
            say(f"exposure {i + 1}/{n} written")
        return paths

    # ------------------------------------------------------------------
    def direct_image_filter(self) -> str:
        return self.cfg.direct_image_filter or (
            "F105W" if self.cfg.grism.upper() == "G102" else "F140W")

    def simulate_direct_image(self, ideal: bool = False):
        """Run the direct image through the REAL detector chain.

        Real WFC3 grism visits open with an undispersed imaging-filter
        exposure used by reduction pipelines for the wavelength
        zero-point (reference: direct-image frame at visit start,
        SURVEY.md:100). This builds imaging-filter tables (all flux at
        (x_ref, y_ref), filter bandpass sensitivity, collapsed flat) and
        runs the SAME fused exposure kernel with the SAME noise chain as
        the spectra, producing a genuine multiaccum product.

        ``ideal=True`` runs it noise-free with the ideal accumulation
        materialised — the persistence stimulus driver.

        Returns (ExposureResult, imaging Tables, ExposureStatic).
        """
        import dataclasses as _dc

        from wayne_tpu.calibration import imaging_tables
        from wayne_tpu.config import ExposureStatic, NoiseFlags
        from wayne_tpu.ops.exposure import simulate_exposure

        cfg = self.cfg
        nsamp_di = cfg.direct_image_nsamp
        tab = imaging_tables(self.tables, self.direct_image_filter(),
                             nsamp=nsamp_di, samp_seq="RAPID")
        static = ExposureStatic(
            subarray=cfg.subarray, n_lambda=cfg.n_lambda, n_sub=2,
            nsamp=nsamp_di, samp_seq="RAPID", scan=False,
            noise=NoiseFlags.none() if ideal else cfg.noise,
            compute_ideal=ideal,
            max_cr_per_read=self.static.max_cr_per_read,
            transit_quad=16, x_psf=True)
        one = jax.tree_util.tree_map(lambda a: a[0], self.scenes)
        scene = _dc.replace(
            one,
            exp_start_s=jnp.float32(0.0),       # visit start, pre-spectra
            orbit_start_s=jnp.float32(0.0),
            is_first_orbit=jnp.float32(1.0),
            scan_speed=jnp.float32(0.0),
            persist_rate=None,                  # opens the visit: no prior
            #                                     stimulus to glow from
            trap_mult=None,                     # ... and no trap deficit
            #                                     from exposures not yet taken
            key=jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 10_000_000))
        return simulate_exposure(scene, tab, static), tab, static

    def _write_direct_image(self, outdir: str, resume: bool = True) -> None:
        """Write the visit-opening direct image as a multiaccum ima."""
        from wayne_tpu.io.ima import write_ima

        path = os.path.join(outdir, f"{self.cfg.star.name}_direct.fits")
        if resume and os.path.exists(path):
            return
        res, tab, static = self.simulate_direct_image()
        x0 = float(np.asarray(self.scenes.x_ref)[0])
        y0 = float(np.asarray(self.scenes.y_ref)[0])
        hdr = default_primary_header(
            targname=self.cfg.star.name, grism=self.direct_image_filter(),
            nsamp=static.nsamp, samp_seq=static.samp_seq,
            subarray=self.cfg.subarray, expstart_mjd=self.plan.start_mjd,
            exptime_s=float(tab.read_times[-1]), scan=False,
            scan_rate_pix_s=0.0,
            extra={"OBSTYPE": "IMAGING", "XREF": x0, "YREF": y0,
                   "SIMSEED": self.cfg.seed})
        # Same DQ recipe and per-pixel ERR inputs as every spectral
        # product of the visit — pipelines reading the direct image for
        # the wavelength zero-point see hot pixels flagged and a
        # consistent error model.
        reads = np.asarray(res.reads_dn)
        gain = float(self.tables.gain)
        _, bias_ped, gain_map, bias_e_map = self._detector_planes()
        dq = self._exposure_dq(reads, gain, np.asarray(res.cr_pos),
                               np.asarray(res.cr_count), tab)
        write_ima(path, reads,
                  np.asarray(tab.read_times, np.float64), hdr,
                  gain=gain,
                  read_noise_e=float(self.tables.read_noise_e),
                  dq=dq,
                  bias_pedestal_e=bias_ped,
                  units=self.cfg.output_units,
                  gain_map=gain_map,
                  bias_e_map=bias_e_map)
