"""PSF pixel-integration tests: static erf splat + analytic scan integral."""

import jax.numpy as jnp
import numpy as np
from scipy.special import erf as scipy_erf

from wayne_tpu.ops.psf import (
    ierf, pixel_fractions_moving, pixel_fractions_static,
)


def test_ierf_matches_numeric_antiderivative():
    xs = np.linspace(-4, 4, 17)
    for x in xs:
        grid = np.linspace(0.0, x, 20001)
        numeric = np.trapezoid(scipy_erf(grid), grid) + 1.0 / np.sqrt(np.pi)
        np.testing.assert_allclose(float(ierf(jnp.float32(x))), numeric,
                                   rtol=2e-5, atol=2e-6)


def test_static_fractions_match_scipy_and_sum_to_one():
    S = 64
    edges = jnp.arange(S + 1, dtype=jnp.float32) - 0.5
    center, sigma = 31.3, 1.7
    frac = pixel_fractions_static(edges[None], jnp.array([center]),
                                  jnp.array([sigma]))[0]
    u = (np.arange(S + 1) - 0.5 - center) / (np.sqrt(2) * sigma)
    expect = 0.5 * np.diff(scipy_erf(u))
    np.testing.assert_allclose(np.asarray(frac), expect, atol=1e-6)
    np.testing.assert_allclose(float(frac.sum()), 1.0, atol=1e-5)


def test_moving_fractions_match_brute_force_time_average():
    S = 64
    edges = jnp.arange(S + 1, dtype=jnp.float32) - 0.5
    sigma = 0.9
    c0, c1 = 20.0, 33.5   # scan across ~13 rows
    got = pixel_fractions_moving(edges[None], jnp.array([c0]),
                                 jnp.array([c1]), jnp.array([sigma]))[0]
    # fp64 brute force: average static profiles over 20001 positions
    cs = np.linspace(c0, c1, 20001)
    u = (np.arange(S + 1)[None, :] - 0.5 - cs[:, None]) / (np.sqrt(2) * sigma)
    expect = 0.5 * np.diff(scipy_erf(u), axis=1).mean(axis=0)
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)
    np.testing.assert_allclose(float(got.sum()), 1.0, atol=1e-4)


def test_moving_zero_motion_equals_static():
    S = 32
    edges = jnp.arange(S + 1, dtype=jnp.float32) - 0.5
    center = jnp.array([15.2])
    sigma = jnp.array([1.1])
    static = pixel_fractions_static(edges[None], center, sigma)
    moving = pixel_fractions_moving(edges[None], center, center + 1e-7, sigma)
    np.testing.assert_allclose(np.asarray(moving), np.asarray(static), atol=1e-6)


def test_moving_tiny_motion_branch_handover():
    # Both sides of the small-|du| guard must match fp64 truth so the
    # branch handover is seamless.
    S = 32
    edges = jnp.arange(S + 1, dtype=jnp.float32) - 0.5
    sigma = 1.1
    for motion in (9e-4, 3e-3, 2e-2):   # mid branch, exact branch, exact
        got = pixel_fractions_moving(edges[None], jnp.array([15.2]),
                                     jnp.array([15.2 + motion]),
                                     jnp.array([sigma]))[0]
        cs = np.linspace(15.2, 15.2 + motion, 4001)
        u = (np.arange(S + 1)[None, :] - 0.5 - cs[:, None]) / (np.sqrt(2) * sigma)
        expect = 0.5 * np.diff(scipy_erf(u), axis=1).mean(axis=0)
        np.testing.assert_allclose(np.asarray(got), expect, atol=3e-5)


def test_moving_path_matches_per_segment():
    """Node-shared path integration == K independent moving splats."""
    import jax
    from wayne_tpu.ops.psf import (
        pixel_fractions_moving, pixel_fractions_moving_path,
    )
    rng = np.random.RandomState(5)
    NL, W, K = 7, 24, 6
    y_edges = jnp.asarray(np.arange(W + 1) - 0.5 + 3.0, jnp.float32)
    y_edges_b = jnp.broadcast_to(y_edges, (NL, W + 1))
    y_base = jnp.asarray(8.0 + 4.0 * rng.rand(NL), jnp.float32)
    sigma = jnp.asarray(0.45 + 0.3 * rng.rand(NL), jnp.float32)
    for speed in (0.0, 0.01, 0.7, -1.8, 12.0):   # spans both branches
        offsets = jnp.asarray(speed * np.linspace(0, 2.0, K + 1), jnp.float32)
        centers = y_base[None, :] + offsets[:, None]
        got = np.asarray(pixel_fractions_moving_path(y_edges_b, centers, sigma))
        want = np.asarray(jax.vmap(
            lambda o0, o1: pixel_fractions_moving(
                y_edges_b, y_base + o0, y_base + o1, sigma)
        )(offsets[:-1], offsets[1:]))
        # Both are ~1e-6-accurate path averages (different small-du rules).
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_moving_path_against_dense_quadrature():
    from wayne_tpu.ops.psf import pixel_fractions_moving_path, pixel_fractions_static
    W, K = 16, 4
    y_edges = jnp.asarray(np.arange(W + 1) - 0.5, jnp.float32)
    y_edges_b = jnp.broadcast_to(y_edges, (1, W + 1))
    y_base = jnp.asarray([4.0], jnp.float32)
    sigma = jnp.asarray([0.6], jnp.float32)
    offsets = jnp.asarray(np.linspace(0.0, 1.0, K + 1), jnp.float32)
    centers = y_base[None, :] + offsets[:, None]
    got = np.asarray(pixel_fractions_moving_path(y_edges_b, centers, sigma))
    # fp64 dense time quadrature of the static splat per segment
    import numpy as _np
    from scipy.special import erf as _erf
    for k in range(K):
        path = _np.linspace(float(offsets[k]), float(offsets[k + 1]), 4001)
        acc = _np.zeros(W)
        for c in 4.0 + path:
            u = (_np.arange(W + 1) - 0.5 - c) / (_np.sqrt(2) * 0.6)
            e = _erf(u)
            acc += 0.5 * (e[1:] - e[:-1])
        np.testing.assert_allclose(got[k, 0], acc / len(path), atol=2e-6)
