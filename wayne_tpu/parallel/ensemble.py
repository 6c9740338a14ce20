"""Monte-Carlo visit ensembles, sharded over the device mesh.

BASELINE config 5: "Batched ensemble: 10k Monte-Carlo visits vmapped over
G102+G141 on a v5p slice". Ensembles differ only in their RNG keys (and
optionally scene parameters); frames are reduced to extracted 1D spectra
ON DEVICE so a 10k-visit run returns (n_mc, n_exp, S) numbers — not
terabytes of frames — and the host transfer stays tiny.

Partitioning: `shard_map` over the ('mc', 'exp') mesh — each device owns
an (mc/D_mc, exp/D_exp) block and runs it independently (no collectives;
the workload is embarrassingly parallel, SURVEY.md section 5.8). Within a
device, a `lax.map` over local MC realisations bounds peak memory while
`vmap` over local exposures keeps the MXU fed.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic
from wayne_tpu.ops.exposure import simulate_exposure
from wayne_tpu.scene import MC_INVARIANT_FIELDS, Scene


def mc_scenes(visit_scenes: Scene, n_mc: int, seed: int = 0,
              mc_offset: int = 0) -> Scene:
    """Stack a visit's Scene (exp axis) into an (mc, exp) ensemble.

    All physics parameters are shared; only the RNG keys differ, giving
    independent noise realisations of the same visit. Keys derive per
    (GLOBAL realisation index, exposure) from one root seed
    (counter-based, splittable — the reproducibility upgrade over the
    reference's global NumPy RNG). ``mc_offset`` shifts the realisation
    indices: local realisation m is keyed as ``mc_offset + m``, so a
    chunked run (parallel/dataset.py) produces bit-identical draws for
    realisation i regardless of how the chunks are cut.

    MC_INVARIANT_FIELDS (the charge-memory maps) are NOT tiled: they
    stay at their per-visit (n_exp, S, S) shape — the ensemble machinery
    replicates them across devices instead of materialising n_mc
    byte-identical HBM copies.
    """
    n_exp = jax.tree_util.tree_leaves(visit_scenes)[0].shape[0]
    root = jax.random.PRNGKey(seed)
    keys = jax.vmap(
        lambda m: jax.vmap(
            lambda e: jax.random.fold_in(jax.random.fold_in(root, m), e)
        )(jnp.arange(n_exp))
    )(jnp.arange(n_mc) + mc_offset)

    def tile(x):
        return jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n_mc,) + a.shape), x)

    updates: dict = {"key": keys}
    for f in dataclasses.fields(visit_scenes):
        if f.name == "key":
            continue
        v = getattr(visit_scenes, f.name)
        if v is None:
            continue
        updates[f.name] = v if f.name in MC_INVARIANT_FIELDS else tile(v)
    return dataclasses.replace(visit_scenes, **updates)


def extract_spectra(reads_dn: jnp.ndarray,
                    read_times: jnp.ndarray | None = None,
                    good_diffs: jnp.ndarray | None = None) -> jnp.ndarray:
    """On-device box extraction: net counts per column.

    CDS net signal (last read - zeroth read) summed over rows — the
    simplest spectral product a reduction pipeline would form, adequate
    for MC depth-recovery statistics. With ``read_times`` the per-pixel
    estimator is the calwf3-style up-the-ramp least-squares slope
    instead (lower read-noise variance; reduction.ramp_slope_frame).
    ``good_diffs`` (..., NR-1, S, S) bool masks trigger the DQ-aware
    interval repair (reduction.repair_read_stack) first, so simulated
    cosmic rays don't contaminate the ensemble statistics.
    """
    if good_diffs is not None:
        from wayne_tpu.reduction import repair_read_stack

        reads_dn = repair_read_stack(reads_dn, good_diffs)
    if read_times is not None:
        from wayne_tpu.reduction import ramp_slope_frame

        return ramp_slope_frame(
            jnp.moveaxis(reads_dn, -3, 0), read_times).sum(axis=-2)
    net = reads_dn[..., -1, :, :] - reads_dn[..., 0, :, :]
    return net.sum(axis=-2)


from wayne_tpu.parallel.mesh import _leaf_spec as _batch_spec


# One jitted ensemble program per (mesh, cfg, pytree ranks): building a
# fresh jax.jit(closure) per call would re-trace the whole multi-thousand-
# exposure program on EVERY dataset chunk (measured ~2x sustained-rate
# loss in tools/dataset_scale.py); caching the callable restores jit's
# own shape-keyed cache across chunks.
_JIT_CACHE: dict = {}


def _scene_ensemble_specs(scenes: Scene):
    """(mc, exp, ...) specs, except MC-invariant leaves: (exp, ...).

    The charge-memory maps ride un-tiled at (n_exp, S, S) (see
    mc_scenes): their exp axis shards over the mesh 'exp' axis and the
    whole leaf is replicated across 'mc' devices — no per-realisation
    HBM copies.
    """
    from jax.tree_util import GetAttrKey, tree_map_with_path

    from wayne_tpu.scene import MC_INVARIANT_FIELDS

    def spec(path, x):
        name = next((p.name for p in path if isinstance(p, GetAttrKey)),
                    None)
        if name in MC_INVARIANT_FIELDS:
            return P("exp", *([None] * (x.ndim - 1)))
        return _batch_spec(x, 2)

    return tree_map_with_path(spec, scenes)


def _ensemble_fn(mesh: Mesh, cfg: ExposureStatic, scenes: Scene,
                 tables: Tables, ramp: bool, dq_aware: bool,
                 nlincorr: bool):
    scene_specs = _scene_ensemble_specs(scenes)
    table_specs = jax.tree_util.tree_map(lambda _: P(), tables)

    # check_vma=False: jax.random.poisson's internal while_loop carries
    # unvarying leaves that the varying-manual-axes checker rejects; the
    # computation is per-shard independent so the check is vacuous here.
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(scene_specs, table_specs),
             out_specs=P("mc", "exp", None), check_vma=False)
    def run(local_scenes: Scene, local_tables: Tables) -> jnp.ndarray:
        rt = local_tables.read_times if ramp else None
        # MC-invariant leaves carry no mc axis: pull them out of the
        # lax.map (which peels the leading mc axis of every leaf) and
        # reinsert per realisation — XLA sees one shared buffer.
        from wayne_tpu.scene import MC_INVARIANT_FIELDS

        inv = {n: getattr(local_scenes, n) for n in MC_INVARIANT_FIELDS
               if getattr(local_scenes, n) is not None}
        local_scenes = dataclasses.replace(
            local_scenes, **{n: None for n in inv})

        def one(s: Scene) -> jnp.ndarray:
            res = simulate_exposure(s, local_tables, cfg)
            reads = res.reads_dn
            if nlincorr:
                # calwf3 NLINCORR before the flux estimators: the cubic
                # compression is flux-dependent, so unlike static
                # flat/gain structure it does NOT cancel in depth
                # ratios (reduction.linearize_reads; elementwise VPU
                # work, unit-agnostic for the CR repair below).
                from wayne_tpu.reduction import linearize_reads

                g = (local_tables.gain_map if cfg.noise.gain_variations
                     else local_tables.gain)
                bias = local_tables.bias_map if cfg.noise.bias else None
                reads = linearize_reads(reads, local_tables.nonlin_coeffs,
                                        local_tables.full_well_e, g,
                                        bias_e=bias)
            # CRs simulated -> extract DQ-aware: the simulator's own hit
            # lists are the exact truth the ima DQ planes would carry.
            # Corrections apply post-extraction in column space (the
            # estimators are linear), scatter-free: TPU scatters
            # serialize per update — the stack-repair route measured
            # 1.7x the simulation itself here (config 5, 25 -> 10
            # visits/s/chip; see reduction.extract_spectra_cr). The
            # column-space repair costs ~25% of the step (25 -> 19
            # visits/s); dq_aware=False skips it for raw CR-contaminated
            # spectra (training-realism datasets) at full rate.
            if dq_aware and cfg.noise.cosmic_rays:
                from wayne_tpu.reduction import extract_spectra_cr

                return extract_spectra_cr(reads, res.cr_pos,
                                          res.cr_count, rt)
            return extract_spectra(reads, rt)

        def per_mc(sc: Scene) -> jnp.ndarray:
            return jax.vmap(one)(dataclasses.replace(sc, **inv))
        return jax.lax.map(per_mc, local_scenes)

    return jax.jit(run)


def simulate_ensemble_spectra(scenes: Scene, tables: Tables,
                              cfg: ExposureStatic, mesh: Mesh,
                              ramp: bool = False,
                              dq_aware: bool = True,
                              nlincorr: bool = True) -> jnp.ndarray:
    """Extracted spectra for an (mc, exp)-batched Scene -> (mc, exp, S).

    Requires n_mc % mesh.shape['mc'] == 0 and n_exp % mesh.shape['exp'] == 0.
    ``ramp=True`` extracts with the up-the-ramp slope estimator instead
    of CDS (see extract_spectra). ``dq_aware`` (default) repairs
    simulated cosmic-ray hits during extraction (column-space repair,
    reduction.extract_spectra_cr); False keeps the raw CR-contaminated
    spectra and the full extraction rate. ``nlincorr`` (default) inverts
    the per-pixel cubic non-linearity before extraction when the run
    simulates it (calwf3 NLINCORR; no-op with non_linearity off) —
    spectra come back in linearized ELECTRONS instead of DN then.

    Static QE defects (dead pixels / IR blobs on Tables.qe_map) need no
    repair HERE by construction: a static defect is a fixed per-column
    attenuation of every exposure alike, so it cancels exactly in the
    normalised light curves / depth ratios downstream (like the static
    flat and gain structure — reduction.py "ratios" note). The
    file-level reducer (run_reduce) still excludes/repairs them via the
    DQ planes for users consuming absolute spectra.

    UNSTABLE (RTS) pixels do NOT enjoy that cancellation: Tables.rts_amp
    modulates the affected pixels by a per-exposure random telegraph
    state (simulate_exposure applies it unconditionally), so the
    corruption is time-VARYING and survives every normalisation/ratio —
    and this raw-spectra path has no DQ exclusion seam. The function
    warns when rts_amp is active; consumers who need unbiased
    depths from an RTS-afflicted detector should reduce through
    run_reduce/reduce_visit (whose DQ-aware masks exclude DQ-32 pixels)
    or zero the flagged columns out of the spectra with
    io.ima.static_dq_plane before fitting.
    """
    if tables.rts_amp is not None and bool(jnp.any(tables.rts_amp > 0)):
        import warnings

        warnings.warn(
            "simulate_ensemble_spectra: Tables.rts_amp is active — RTS "
            "(unstable-pixel) corruption is time-varying and does NOT "
            "cancel in normalised light curves; these full-frame column "
            "sums carry it unrepaired (reduce via run_reduce's DQ-aware "
            "path, or mask DQ-32 columns, for unbiased depths)",
            stacklevel=2)
    nlincorr = nlincorr and cfg.noise.non_linearity
    # key on the FULL tree structure + leaf ranks (CLAUDE.md cache
    # invariant): rank tuples alone collide for structures that differ
    # only in which optional leaves are present
    ranks = tuple(x.ndim for x in jax.tree_util.tree_leaves(scenes))
    key = (mesh, cfg, jax.tree_util.tree_structure(scenes), ranks, ramp,
           dq_aware, nlincorr)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = _ensemble_fn(mesh, cfg, scenes, tables,
                                            ramp, dq_aware, nlincorr)
    return fn(scenes, tables)
