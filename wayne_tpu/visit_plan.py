"""HST visit planning (reference: wayne/observation_tools.py).

Plans exposure start times across HST orbits: the telescope's ~95.47-min
orbit gives a ~50-min visible window per orbit (the rest lost to Earth
occultation); exposures are spaced by exptime + overhead within each
window. Pure host NumPy — runs once per visit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

HST_PERIOD_S = 95.47 * 60.0          # ~5728 s
VISIBILITY_S = 50.0 * 60.0           # usable window per orbit


@dataclass
class VisitPlan:
    """Exposure timing for one visit (times in s from visit start)."""

    exp_start_s: np.ndarray     # (N,)
    orbit_index: np.ndarray     # (N,) int
    orbit_start_s: np.ndarray   # (N,) start of each exposure's orbit
    exptime_s: float
    start_mjd: float

    @property
    def n_exposures(self) -> int:
        return len(self.exp_start_s)

    def exp_start_mjd(self) -> np.ndarray:
        return self.start_mjd + self.exp_start_s / 86400.0


def plan_visit(n_orbits: int, exptime_s: float, overhead_s: float,
               start_mjd: float, exposures_per_orbit: int = 0,
               first_orbit_trim: float = 0.0) -> VisitPlan:
    """Fill each orbit's visibility window with exposures.

    Args:
      exposures_per_orbit: explicit count per orbit; 0 fills the window.
      first_orbit_trim: seconds skipped at the start of orbit 1 (real
        visits spend it on target acquisition + the direct image).
    """
    cadence = exptime_s + overhead_s
    if exposures_per_orbit <= 0:
        exposures_per_orbit = max(1, int(np.floor(VISIBILITY_S / cadence)))
    starts, orbits, orbit_starts = [], [], []
    for k in range(n_orbits):
        t_orbit = k * HST_PERIOD_S
        t0 = t_orbit + (first_orbit_trim if k == 0 else 0.0)
        for j in range(exposures_per_orbit):
            t = t0 + j * cadence
            if t + exptime_s > t_orbit + VISIBILITY_S:
                break
            starts.append(t)
            orbits.append(k)
            orbit_starts.append(t_orbit)
    return VisitPlan(
        exp_start_s=np.asarray(starts, np.float64),
        orbit_index=np.asarray(orbits, np.int64),
        orbit_start_s=np.asarray(orbit_starts, np.float64),
        exptime_s=exptime_s, start_mjd=start_mjd)
