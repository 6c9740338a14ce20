"""Whole-visit device execution: vmap over exposures, chunked for memory.

The reference iterates exposures in a serial Python loop
(reference: wayne/observation.py :: Observation.generate). Here the whole
visit is one device program: exposures are stacked into a batched Scene
pytree and consumed by ``vmap(simulate_exposure)``; a ``lax.map`` over
fixed-size chunks bounds peak memory (the intermediate row-profile tensor
is per-exposure ~MBs) while keeping everything inside a single jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wayne_tpu.calibration import Tables
from wayne_tpu.config import ExposureStatic
from wayne_tpu.ops.exposure import ExposureResult, simulate_exposure
from wayne_tpu.scene import Scene


def pad_scenes(scenes: Scene, multiple: int) -> tuple[Scene, int]:
    """Pad a batched Scene along axis 0 to a multiple of ``multiple``."""
    n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return scenes, n
    padded = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)]), scenes)
    return padded, n


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def simulate_visit(scenes: Scene, tables: Tables, cfg: ExposureStatic,
                   chunk: int = 8) -> ExposureResult:
    """Run every exposure of a visit on-device.

    Args:
      scenes: Scene pytree batched along axis 0 (N exposures; N must be a
        multiple of ``chunk`` — use :func:`pad_scenes`).
      chunk: exposures computed concurrently; sequential over chunks.

    Returns:
      ExposureResult with leading exposure axis: reads_dn (N, NR, S, S).
    """
    n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    if n % chunk != 0:
        raise ValueError(f"n_exposures {n} not a multiple of chunk {chunk}")
    n_chunks = n // chunk
    chunked = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks, chunk) + x.shape[1:]), scenes)
    run_chunk = jax.vmap(lambda s: simulate_exposure(s, tables, cfg))
    out = jax.lax.map(run_chunk, chunked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n,) + x.shape[2:]), out)


# One compiled sharded-visit program per (mesh, cfg, chunk): rebuilding
# the shard_map + jit closure per chunk-group would re-trace the whole
# visit program on every call (see CLAUDE.md / parallel.ensemble).
_SHARDED_CACHE: dict = {}


def simulate_visit_sharded(scenes: Scene, tables: Tables,
                           cfg: ExposureStatic, mesh, chunk: int = 8
                           ) -> ExposureResult:
    """Run a visit's exposures sharded over EVERY device of ``mesh``.

    Frame production is embarrassingly parallel across exposures (each
    exposure's Scene carries its own counter-derived key), so a D-device
    mesh computes D * chunk exposures per call with no collectives; each
    device runs the identical per-exposure program it would run alone,
    so the resulting ima files match the single-device path exactly.
    Used by Observation.generate(mesh=...) for multi-chip frame-product
    datasets (reduced-spectra ensembles shard via parallel/ensemble).

    The exposure count must be a multiple of D * chunk (pad_scenes).
    """
    from jax.sharding import Mesh, PartitionSpec as P

    devices = mesh.devices.reshape(-1)
    n = jax.tree_util.tree_leaves(scenes)[0].shape[0]
    if n % (devices.size * chunk) != 0:
        raise ValueError(
            f"n_exposures {n} not a multiple of devices*chunk = "
            f"{devices.size}*{chunk}")

    # The Scene structure is part of the key: an optional leaf (e.g.
    # persist_rate) present vs absent changes the in_specs tree.
    key = (tuple(d.id for d in devices), cfg, chunk,
           jax.tree_util.tree_structure(scenes))
    fn = _SHARDED_CACHE.get(key)
    if fn is None:
        flat = Mesh(devices, ("exp",))
        scene_specs = jax.tree_util.tree_map(lambda _: P("exp"), scenes)
        table_specs = jax.tree_util.tree_map(lambda _: P(), tables)
        out_specs = ExposureResult(
            reads_dn=P("exp"), ideal_e=P("exp"), saturated_frac=P("exp"),
            cr_pos=P("exp"), cr_count=P("exp"))

        # check_vma=False: jax.random.poisson's internal while_loop
        # carries unvarying leaves the varying-manual-axes checker
        # rejects; shards are independent so the check is vacuous.
        @partial(jax.shard_map, mesh=flat,
                 in_specs=(scene_specs, table_specs), out_specs=out_specs,
                 check_vma=False)
        def run(local_scenes: Scene, local_tables: Tables) -> ExposureResult:
            return simulate_visit(local_scenes, local_tables, cfg, chunk)

        fn = _SHARDED_CACHE[key] = jax.jit(run)
    return fn(scenes, tables)


def visit_fluence_stack(scenes: Scene, tables: Tables, cfg: ExposureStatic,
                        chunk: int = 8) -> jnp.ndarray:
    """Noise-free end-of-exposure fluence maps (N, S, S).

    The ideal source accumulation plus the DETERMINISTIC expectation of
    whatever background the run's noise flags actually enable (sky,
    dark) — the charge that really arrives in each pixel, which is the
    stimulus driver shared by the persistence afterglow and RECTE
    charge-trap models (ops/persistence.py, ops/recte.py). Computed from
    one physics-only pass of the visit; Observation shares a single
    stack between both models instead of paying the pass twice.

    Gating the background on the flags matters for consistency: the
    trap deficit is divided by this fluence to form the thinning factor
    the kernel applies to the ENABLED components only — an
    unconditionally included background would understate the applied
    deficit in sky-off/dark-off runs.
    """
    import dataclasses as _dc

    from wayne_tpu.config import NoiseFlags

    ideal_cfg = _dc.replace(cfg, noise=NoiseFlags.none(),
                            compute_ideal=True, use_pallas=False)
    padded, n = pad_scenes(scenes, chunk)
    ideal = simulate_visit(padded, tables, ideal_cfg, chunk).ideal_e[:n]
    exptime = float(tables.read_times[-1])
    bg = None
    if cfg.noise.sky:
        bg = scenes.sky_level[:, None, None] * tables.sky_frame[None]
    if cfg.noise.dark:
        d = jnp.broadcast_to(tables.dark_map[None], ideal.shape)
        bg = d if bg is None else bg + d
    if bg is not None:
        ideal = ideal + bg * exptime * tables.active_mask[None]
    return ideal
