"""Optional matplotlib quicklook diagnostics (reference: wayne's optional
matplotlib/seaborn visit plots — SURVEY.md section 5.5).

Host-side, import-guarded: the simulator never requires matplotlib.
"""

from __future__ import annotations

import os

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def quicklook_exposure(reads_dn: np.ndarray, path: str,
                       title: str = "exposure") -> str:
    """Last-read image + up-the-ramp pixel traces -> one PNG."""
    plt = _plt()
    reads = np.asarray(reads_dn)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.5))
    net = reads[-1] - reads[0]
    im = axes[0].imshow(net, origin="lower", cmap="magma",
                        vmin=0, vmax=np.percentile(net, 99.5))
    axes[0].set_title(f"{title}: last - zeroth read (DN)")
    fig.colorbar(im, ax=axes[0], shrink=0.8)
    ys, xs = np.unravel_index(np.argsort(net.ravel())[-5:], net.shape)
    for y, x in zip(ys, xs):
        axes[1].plot(reads[:, y, x] - reads[0, y, x], marker="o", ms=3,
                     label=f"({y},{x})")
    axes[1].set_xlabel("read")
    axes[1].set_ylabel("DN above zeroth read")
    axes[1].set_title("up-the-ramp samples (brightest pixels)")
    axes[1].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def quicklook_visit(spectra_e: np.ndarray, white_lc: np.ndarray,
                    exp_mid_s: np.ndarray, path: str) -> str:
    """Extracted spectra stack + white light curve -> one PNG."""
    plt = _plt()
    spectra = np.asarray(spectra_e)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    im = axes[0].imshow(spectra, origin="lower", aspect="auto", cmap="viridis")
    axes[0].set_xlabel("detector column")
    axes[0].set_ylabel("exposure")
    axes[0].set_title("extracted spectra (e-)")
    fig.colorbar(im, ax=axes[0], shrink=0.8)
    t = np.asarray(exp_mid_s) / 3600.0
    axes[1].plot(t, np.asarray(white_lc), ".", ms=4)
    axes[1].set_xlabel("time (h)")
    axes[1].set_ylabel("relative flux")
    axes[1].set_title("white light curve")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def quicklook_reduction(report: dict, path: str) -> str:
    """One PNG from a run_reduce JSON report: white light curve + the
    recovered spectrum with error bars (transmission Rp/Rs in transit
    mode, emission Fp/Fs in eclipse mode)."""
    plt = _plt()
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    t = np.asarray(report["mid_times_s"]) / 3600.0
    axes[0].plot(t, np.asarray(report["white_lc"]), ".", ms=4)
    axes[0].set_xlabel("time (h)")
    axes[0].set_ylabel("relative flux")
    axes[0].set_title("white light curve")
    chans = report["channels"]
    wl = [(c["wl_lo_um"] + c["wl_hi_um"]) / 2 for c in chans]
    emission = report.get("mode") in ("eclipse", "phase")
    key, skey = (("fp_over_fs", "fp_sigma") if emission
                 else ("rp_over_rs", "rp_sigma"))
    rp = [c[key] for c in chans]
    sig = [c[skey] for c in chans]
    axes[1].errorbar(wl, rp, yerr=sig, fmt="o", ms=4, capsize=3)
    axes[1].set_xlabel("wavelength (um)")
    axes[1].set_ylabel("Fp / Fs" if emission else "Rp / Rs")
    axes[1].set_title("recovered " + ("emission" if emission
                                      else "transmission") + " spectrum")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def visit_quicklooks(obs, result, outdir: str) -> list[str]:
    """Write quicklook PNGs for an Observation + simulate() result."""
    from wayne_tpu.reduction import reduce_visit

    os.makedirs(outdir, exist_ok=True)
    paths = []
    reads = np.asarray(result.reads_dn)
    paths.append(quicklook_exposure(
        reads[0], os.path.join(outdir, "exposure0.png"),
        title=f"{obs.cfg.star.name} {obs.cfg.grism}"))
    S = obs.cfg.subarray
    mid = obs.plan.exp_start_s + obs.detector_exptime / 2.0
    red = reduce_visit(
        result.reads_dn, obs.tables.gain,
        np.asarray(mid, np.float32), obs.planet.orbit_params(),
        y_window=(0, S), x_window=(0, S), bg_rows=(0, max(S // 16, 2)),
        n_chan=8)
    paths.append(quicklook_visit(
        red.spectra_e, red.white_lc, mid,
        os.path.join(outdir, "visit_lightcurve.png")))
    return paths
