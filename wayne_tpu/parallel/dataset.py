"""Large-scale dataset generation: parameter sweeps + resumable chunks.

The BASELINE north star calls for batching visits "across Monte-Carlo
noise realizations for dataset generation". This module adds the two
pieces an ML-dataset producer needs on top of parallel/ensemble.py:

  - :func:`sweep_scenes` — vary *physics* across the ensemble axis
    (transmission spectra, mid-times, systematics amplitudes, ...), not
    just RNG keys;
  - :func:`generate_dataset` — run an (mc, exp) ensemble in chunks,
    writing each chunk's extracted spectra + labels to disk immediately:
    a crashed run resumes at the first missing chunk (the same
    incremental-checkpoint property the per-exposure FITS writes give a
    single visit — SURVEY.md section 5.3/5.4).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic
from wayne_tpu.parallel.ensemble import mc_scenes, simulate_ensemble_spectra
from wayne_tpu.parallel.mesh import make_mesh, shard_scenes
from wayne_tpu.scene import Scene


def _fingerprint(tree) -> str:
    """Content hash of a pytree of arrays/scalars (resume-safety checks)."""
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:16]


def _chunk_input_fingerprints(n_mc: int, chunk_mc: int, overrides,
                              labels) -> list[str | None]:
    """Per-chunk content hash of the override/label slices that shaped it.

    Per-chunk (not whole-array) so that GROWING a dataset — rerunning
    with a larger n_mc whose overrides/labels extend the previous run's
    as a prefix — still resumes cleanly, while regenerated samples or
    edited labels for an already-written chunk are rejected.
    """
    out: list[str | None] = []
    for c0 in range(0, n_mc, chunk_mc):
        parts = []
        if overrides:
            parts.append({k: np.asarray(v)[c0: c0 + chunk_mc]
                          for k, v in sorted(overrides.items())})
        if labels:
            parts.append({k: np.asarray(v)[c0: c0 + chunk_mc]
                          for k, v in sorted(labels.items())})
        out.append(_fingerprint(parts) if parts else None)
    return out


def sweep_scenes(visit_scenes: Scene, n_mc: int, seed: int = 0,
                 overrides: Mapping[str, jnp.ndarray] | None = None,
                 mc_offset: int = 0) -> Scene:
    """An (mc, exp) ensemble whose realisations differ in physics.

    Args:
      visit_scenes: Scene batched over exposures (exp axis).
      overrides: per-field arrays with leading axis n_mc. A field of
        shape (n_mc, ...) broadcasts over exposures; (n_mc, n_exp, ...)
        is taken verbatim. Example:
        ``{"rp_over_rs": rp_samples}`` with rp_samples (n_mc, NL).
      mc_offset: global index of the first realisation (see mc_scenes) —
        keys depend only on seed + global index, never on chunking.

    RNG keys always differ per (realisation, exposure).
    """
    ens = mc_scenes(visit_scenes, n_mc, seed, mc_offset=mc_offset)
    if not overrides:
        return ens
    n_exp = jax.tree_util.tree_leaves(visit_scenes)[0].shape[0]
    updates: dict[str, jnp.ndarray] = {}
    for name, value in overrides.items():
        cur = getattr(ens, name)
        value = jnp.asarray(value, cur.dtype)
        if value.shape[0] != n_mc:
            raise ValueError(f"override {name!r} must lead with n_mc={n_mc}")
        if value.ndim == cur.ndim:          # (mc, exp, ...) verbatim
            if value.shape[1] != n_exp:
                raise ValueError(
                    f"override {name!r} exposure axis is {value.shape[1]}, "
                    f"the visit has {n_exp} exposures")
            updates[name] = value
        elif value.ndim == cur.ndim - 1:    # (mc, ...) -> broadcast over exp
            updates[name] = jnp.broadcast_to(value[:, None], cur.shape)
        else:
            raise ValueError(f"override {name!r} has rank {value.ndim}, "
                             f"expected {cur.ndim} or {cur.ndim - 1}")
    return dataclasses.replace(ens, **updates)


def generate_dataset(visit_scenes: Scene, tables: Tables, cfg: ExposureStatic,
                     outdir: str, *, n_mc: int, chunk_mc: int = 16,
                     seed: int = 0,
                     overrides: Mapping[str, jnp.ndarray] | None = None,
                     labels: Mapping[str, np.ndarray] | None = None,
                     mesh=None, progress=None,
                     dq_aware: bool = True,
                     recover: Mapping[str, Any] | None = None
                     ) -> dict[str, Any]:
    """Generate an n_mc-realisation spectral dataset, resumably.

    Writes ``chunk_XXXX.npz`` files containing extracted spectra
    (chunk_mc, n_exp, S) plus any per-realisation ``labels`` slices, and a
    ``manifest.json``. Already-present chunks are skipped on re-run.
    ``dq_aware=False`` keeps simulated cosmic rays IN the spectra
    (training-realism datasets) instead of repairing them at extraction.

    ``recover`` attaches RECOVERED depth labels: each chunk is also
    reduced on device (channel binning, OOT normalisation, optional
    divide-white, autodiff depth fits — reduction.spectra_to_depths,
    vmapped over realisations) and ``recovered_rp`` /
    ``recovered_rp_sigma`` (chunk_mc, n_chan) are stored alongside the
    spectra, plus the sigma decomposition
    (``recovered_rp_sigma_rel`` (chunk_mc, n_chan): channel-to-channel
    shape error; ``recovered_rp_sigma_common`` (chunk_mc,): the
    coherent divide-white common-mode term — Cov = diag(rel^2) +
    common^2 * ones) and ``recovered_constrained`` (chunk_mc, n_chan)
    quality flags (reduction.constrained_mask). Required keys: ``exp_mid_s`` (n_exp,), ``orbit``
    (OrbitParams), ``ld`` (4,), ``rp0``, ``x_window`` (lo, hi).
    Optional: ``n_chan`` (8), ``divide_white`` (True), ``subtract_bg``
    (True — the ensemble spectra are full-frame column sums, so the
    sky background must be removed before fitting or every depth is
    diluted by F/(F+B)). Injected labels alone hide
    reduction-systematic structure; the recovered depths expose it per
    realisation.

    Memory note: the per-exposure (n_exp, S, S) persistence/RECTE maps
    are MC-invariant (scene.MC_INVARIANT_FIELDS) and ride the ensemble
    un-tiled — one shared HBM buffer per leaf, replicated across the
    mesh's mc devices, never chunk_mc copies.
    """
    os.makedirs(outdir, exist_ok=True)
    say = progress or (lambda s: None)
    if mesh is None:
        mesh = make_mesh(jax.devices()[:1])
    if n_mc % chunk_mc != 0:
        raise ValueError("n_mc must be a multiple of chunk_mc")
    d_mc = mesh.shape["mc"]
    if chunk_mc % d_mc != 0:
        raise ValueError(f"chunk_mc must be a multiple of mesh mc={d_mc}")
    n_exp_check = jax.tree_util.tree_leaves(visit_scenes)[0].shape[0]
    d_exp = mesh.shape["exp"]
    if n_exp_check % d_exp != 0:
        raise ValueError(
            f"visit has {n_exp_check} exposures, not shardable over the "
            f"mesh exp={d_exp} axis — pad the visit or choose a mesh "
            f"whose exp axis divides it")
    if recover is not None and int(recover.get("n_chan", 8)) < 1:
        raise ValueError("recover n_chan must be >= 1")
    if labels:
        for k, v in labels.items():
            if len(np.asarray(v)) != n_mc:
                raise ValueError(
                    f"label {k!r} has {len(np.asarray(v))} rows, expected "
                    f"n_mc={n_mc} — a short label array would be silently "
                    f"truncated against the final chunks' spectra")

    # Resume safety: skipped chunks and the settings that shaped them
    # must match THIS invocation, or the concatenated dataset silently
    # mixes incompatible rows (e.g. old chunks without recovered_rp
    # shifting every later realisation's recovered labels). Array-valued
    # inputs (override/label contents, recover's orbit/times/ld) are
    # compared by content fingerprint — names alone would accept
    # regenerated samples or a corrected ephemeris against stale chunks.
    recover_desc = None
    if recover is not None:
        recover_desc = {
            "n_chan": int(recover.get("n_chan", 8)),
            "x_window": [int(x) for x in recover["x_window"]],
            "rp0": float(recover["rp0"]),
            "divide_white": bool(recover.get("divide_white", True)),
            "subtract_bg": bool(recover.get("subtract_bg", True)),
            "scan_dir": recover.get("scan_dir") is not None,
            "inputs_sha": _fingerprint((recover["exp_mid_s"],
                                        recover["orbit"], recover["ld"])),
        }
    expected_keys = {"spectra_e"}
    if recover is not None:
        expected_keys |= {"recovered_rp", "recovered_rp_sigma",
                          "recovered_rp_sigma_rel",
                          "recovered_rp_sigma_common",
                          "recovered_constrained"}
    if labels:
        expected_keys |= {f"label_{k}" for k in labels}
    manifest_path = os.path.join(outdir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            prev = json.load(fh)
        checks = {"chunk_mc": chunk_mc, "seed": seed, "dq_aware": dq_aware,
                  "n_exp": n_exp_check, "subarray": cfg.subarray,
                  "labels": sorted(labels) if labels else [],
                  "recover": recover_desc,
                  # spectra convention: NLINCORR-linearized electrons vs
                  # raw DN sums — mixing them across a resume would
                  # silently corrupt the concatenated dataset
                  "nlincorr": bool(cfg.noise.non_linearity)}
        # pre-NLINCORR manifests lack the key; their chunks are raw-DN
        # sums, so treat the old convention as False rather than
        # skipping the check
        prev.setdefault("nlincorr", False)
        for key, cur in checks.items():
            if key in prev and prev[key] != cur:
                raise ValueError(
                    f"resume mismatch in {manifest_path}: {key} was "
                    f"{prev[key]!r}, this run uses {cur!r} — existing "
                    f"chunks would be inconsistent; delete {outdir} or "
                    f"match the original settings")
        # Content check on the chunks being skipped: the overrides/label
        # SLICES that shaped each existing chunk must be byte-identical
        # in this run (a prefix match, so growing n_mc still resumes).
        prev_shas = prev.get("chunk_inputs_sha") or []
        cur_shas = _chunk_input_fingerprints(n_mc, chunk_mc, overrides,
                                             labels)
        n_cmp = min(len(prev_shas), len(cur_shas))
        for i in range(n_cmp):
            if prev_shas[i] != cur_shas[i]:
                raise ValueError(
                    f"resume mismatch in {manifest_path}: chunk {i}'s "
                    f"override/label content differs from the run that "
                    f"wrote it — regenerated samples or an edited label "
                    f"array would silently corrupt the concatenated "
                    f"dataset; delete {outdir} or restore the original "
                    f"inputs")

    n_exp = jax.tree_util.tree_leaves(visit_scenes)[0].shape[0]
    written = []

    # Two-stage pipeline: while the device computes chunk i+1 (async
    # dispatch + early copy_to_host_async), the host compresses and
    # writes chunk i — the sustained rate is max(device, host) instead
    # of their sum.
    def flush(pending) -> None:
        path, dev_spectra, dev_recovered, c0 = pending
        spectra = np.asarray(dev_spectra)     # blocks on transfer only
        payload = {"spectra_e": spectra}
        if dev_recovered is not None:
            from wayne_tpu.reduction import constrained_mask

            rp_rec = np.asarray(dev_recovered[0])
            sig_rec = np.asarray(dev_recovered[1])
            payload["recovered_rp"] = rp_rec
            payload["recovered_rp_sigma"] = sig_rec
            # shape vs common-mode split (divide-white rank-1
            # covariance; see reduction.divide_white_fit_depths) and
            # the per-channel quality flag — consumers must not have
            # to infer a dead channel from an absurd sigma
            payload["recovered_rp_sigma_rel"] = np.asarray(
                dev_recovered[2])
            payload["recovered_rp_sigma_common"] = np.broadcast_to(
                np.asarray(dev_recovered[3]), (rp_rec.shape[0],)).copy()
            payload["recovered_constrained"] = np.asarray(
                constrained_mask(rp_rec, sig_rec))
        if labels:
            for k, v in labels.items():
                payload[f"label_{k}"] = np.asarray(v)[c0: c0 + chunk_mc]
        # Atomic publish: a crash mid-write must not leave a truncated
        # chunk_XXXX.npz that a resume would trip over (the pipeline
        # overlaps writes with device compute, so mid-write crashes are
        # the LIKELY crash point, not a corner case).
        tmp = path[:-4] + ".tmp.npz"
        np.savez_compressed(tmp, **payload)
        os.replace(tmp, path)
        say(f"chunk {c0 // chunk_mc}: wrote {spectra.shape}")

    pending = None
    for c0 in range(0, n_mc, chunk_mc):
        path = os.path.join(outdir, f"chunk_{c0 // chunk_mc:04d}.npz")
        written.append(os.path.basename(path))
        if os.path.exists(path):
            try:
                with np.load(path) as z:
                    have = set(z.files)
            except Exception:
                # Pre-atomic-write partial file (or disk corruption):
                # regenerate instead of aborting the resume.
                say(f"chunk {c0 // chunk_mc}: corrupt/partial, regenerating")
                os.remove(path)
            else:
                if have != expected_keys:
                    raise ValueError(
                        f"resume mismatch: {path} holds {sorted(have)}, this "
                        f"run expects {sorted(expected_keys)} — delete the "
                        f"stale chunks or use a fresh outdir")
                say(f"chunk {c0 // chunk_mc}: exists, skipping")
                continue
        over = None
        if overrides:
            over = {k: jnp.asarray(v)[c0: c0 + chunk_mc]
                    for k, v in overrides.items()}
        # Realisation keys fold the GLOBAL index c0+i (not the chunk
        # seed), so realisation i draws identical noise no matter how
        # the run is chunked — chunk-size changes and resumes are exact.
        ens = sweep_scenes(visit_scenes, chunk_mc, seed=seed,
                           overrides=over, mc_offset=c0)
        ens = shard_scenes(ens, mesh)
        spectra = simulate_ensemble_spectra(ens, tables, cfg, mesh,
                                            dq_aware=dq_aware)
        recovered = None
        if recover is not None:
            from wayne_tpu.reduction import spectra_to_depths

            recovered = spectra_to_depths(
                spectra, recover["exp_mid_s"], recover["orbit"],
                recover["ld"], recover["rp0"],
                x_window=tuple(recover["x_window"]),
                n_chan=int(recover.get("n_chan", 8)),
                divide_white=bool(recover.get("divide_white", True)),
                # ensemble spectra are full-frame column sums: remove
                # the sky background or every depth is diluted (see
                # reduction.spectra_to_depths)
                subtract_bg=bool(recover.get("subtract_bg", True)),
                # forward/reverse visits: per-direction OOT baselines
                # remove the upstream/downstream offset
                scan_dir=recover.get("scan_dir"),
                # sigma decomposition (rel vs common-mode) rides along
                sigma_components=True)
        try:
            spectra.copy_to_host_async()
        except Exception:  # pragma: no cover - backend-dependent
            pass
        if pending is not None:
            flush(pending)
        pending = (path, spectra, recovered, c0)
    if pending is not None:
        flush(pending)

    manifest = {
        "n_mc": n_mc, "chunk_mc": chunk_mc, "n_exp": n_exp,
        "subarray": cfg.subarray, "seed": seed, "dq_aware": dq_aware,
        "labels": sorted(labels) if labels else [],
        "chunk_inputs_sha": _chunk_input_fingerprints(n_mc, chunk_mc,
                                                      overrides, labels),
        "recovered": recover is not None,
        "recover": recover_desc,
        "nlincorr": bool(cfg.noise.non_linearity),
        "chunks": written,
    }
    with open(os.path.join(outdir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return manifest


def load_dataset(outdir: str) -> dict[str, np.ndarray]:
    """Concatenate all chunks of a generated dataset."""
    with open(os.path.join(outdir, "manifest.json")) as fh:
        manifest = json.load(fh)
    arrays: dict[str, list[np.ndarray]] = {}
    for name in manifest["chunks"]:
        with np.load(os.path.join(outdir, name)) as z:
            for k in z.files:
                arrays.setdefault(k, []).append(z[k])
    return {k: np.concatenate(v) for k, v in arrays.items()}
