"""Scene: the dynamic (traced) inputs of one exposure.

Everything that varies exposure-to-exposure (pointing after drift, start
time, scan speed/direction, RNG key) or visit-to-visit (spectra, orbit,
systematics amplitudes) lives in this pytree; stacking Scenes along a
leading axis gives a whole visit that a single vmapped kernel consumes.
This replaces the reference's per-exposure Python call
(reference: wayne/observation.py :: Observation.generate loop passing
per-exposure x_ref/y_ref/time into ExposureGenerator).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from wayne_tpu.ops.kepler import OrbitParams
from wayne_tpu.trends import TrendParams


from wayne_tpu.pytree import register as _register


@_register
@dataclass
class CompanionParams:
    """Contaminating field sources (beyond the reference, which models a
    single star): nearby stars whose grism spectra overlap the target's.

    Each companion is a point source at a direct-image offset from the
    target's reference position; its spectrum disperses from ITS OWN
    field position (the aXe trace/wavelength polynomials are re-evaluated
    there), rides the same scan motion, SSV and visit trends (telescope-
    and detector-level effects are source-independent), and carries no
    transit/eclipse/spot signal. Built host-side by
    Observation._build_companions from the ``companions:`` YAML list.
    """

    dx_px: jnp.ndarray    # (n_comp,) direct-image column offset (px)
    dy_px: jnp.ndarray    # (n_comp,) direct-image row offset (px)
    flux: jnp.ndarray     # (n_comp, NL) F_lambda on the instrument grid
    #                       (same units as Scene.stellar_flux)


@_register
@dataclass
class Scene:
    """Dynamic inputs of one exposure. All leaves are jnp arrays."""

    x_ref: jnp.ndarray            # direct-image reference col (subarray px)
    y_ref: jnp.ndarray            # reference row at exposure start
    exp_start_s: jnp.ndarray      # exposure start on the visit clock (s)
    orbit_start_s: jnp.ndarray    # start of the current HST orbit (s)
    is_first_orbit: jnp.ndarray   # 1.0 in the first orbit (stronger hook)
    scan_speed: jnp.ndarray       # signed scan rate (px/s); 0 for staring
    stellar_flux: jnp.ndarray     # (NL,) F_lambda, erg/s/cm^2/um on wl grid
    rp_over_rs: jnp.ndarray       # (NL,) transmission spectrum
    fp_over_fs: jnp.ndarray       # (NL,) dayside emission contrast Fp/Fs
    #                               (secondary-eclipse depth; zeros = no
    #                               planet light, only read when
    #                               ExposureStatic.eclipse is set)
    phase_amp: jnp.ndarray        # thermal phase-curve amplitude in [0,1]
    #                               (0 = constant dayside contrast)
    phase_offset: jnp.ndarray     # hot-spot offset (rad, + = eastward)
    ld: jnp.ndarray               # (4,) Claret coefficients
    orbit: OrbitParams
    trends: TrendParams
    sky_level: jnp.ndarray        # mean sky rate (e-/s/px)
    key: jnp.ndarray              # jax.random key
    persist_rate: jnp.ndarray | None = None   # (S, S) image-persistence
    #                               rate map (e-/s) from EARLIER exposures
    #                               (ops/persistence.py); None (the
    #                               default) is pytree-invisible, so
    #                               existing Scenes/caches are untouched
    psf_scale: jnp.ndarray | None = None      # scalar PSF-width multiplier
    #                               (HST focus breathing, trends
    #                               breathing_amp; None = 1 exactly and
    #                               pytree-invisible)
    trap_mult: jnp.ndarray | None = None      # (S, S) RECTE charge-trap
    #                               thinning plane in (0, 1] (ops/recte.py):
    #                               the fraction of this exposure's
    #                               expected source+sky+dark charge that
    #                               escapes capture. Trap RELEASE arrives
    #                               via persist_rate. None = no trapping.
    spots: object | None = None   # ops/spots.SpotParams: starspot set
    #                               (crossing bumps + chromatic depth
    #                               dilution). None (default) is
    #                               pytree-invisible — immaculate star.
    companions: CompanionParams | None = None   # contaminating field
    #                               sources whose spectra overlap the
    #                               target's (None = isolated target,
    #                               pytree-invisible).
    sky_he_level: jnp.ndarray | None = None     # He 1.083 um airglow
    #                               level (e-/s/px at the helium frame's
    #                               mean) — the strongly time-variable
    #                               sky component real IR background
    #                               models carry separately from the
    #                               zodi/earthshine continuum. Scales
    #                               Tables.sky_he_frame; None (default)
    #                               is pytree-invisible.


# Scene fields that are IDENTICAL for every Monte-Carlo realisation of a
# visit: the charge-memory maps are computed once from the noise-free
# stimulus (Observation._visit_fluence) and do not depend on the RNG key
# or the swept physics. Ensembles keep them at their per-visit
# (n_exp, S, S) shape and replicate across the mc mesh axis instead of
# materialising chunk_mc copies in HBM (~chunk_mc * n_exp * S^2 * 4 B
# per leaf otherwise; see parallel/ensemble.py, parallel/mesh.py).
MC_INVARIANT_FIELDS = frozenset({"persist_rate", "trap_mult"})


def example_scene(n_lambda: int, *, seed: int = 0,
                  scan_speed: float = 1.0) -> Scene:
    """A synthetic WASP-43b-like scene, mainly for tests and benchmarks."""
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    wl = jnp.linspace(1.075, 1.7, n_lambda)
    stellar = 3.13e-10 * (wl / 1.25) ** -2        # ~J=10 mag, smooth red slope
    rp = 0.1595 + 0.002 * jnp.sin(8.0 * wl)       # wiggly transmission spectrum
    orbit = OrbitParams.create(
        period_s=0.813475 * 86400.0, t0_s=2.0 * 3600.0,
        sma_rs=4.855, inc_rad=jnp.deg2rad(82.1))
    return Scene(
        x_ref=f32(180.0), y_ref=f32(120.0), exp_start_s=f32(0.0),
        orbit_start_s=f32(0.0), is_first_orbit=f32(1.0),
        scan_speed=f32(scan_speed),
        stellar_flux=f32(stellar), rp_over_rs=f32(rp),
        fp_over_fs=jnp.zeros(n_lambda, jnp.float32),
        phase_amp=f32(0.0), phase_offset=f32(0.0),
        ld=f32(jnp.array([0.65, -0.25, 0.45, -0.2])),
        orbit=orbit, trends=TrendParams.create(),
        sky_level=f32(1.2), key=jax.random.PRNGKey(seed),
    )
