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
