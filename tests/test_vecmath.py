"""Closed-form unit tests for core vector math (SURVEY.md §4 test pyramid:
unit tests against closed-form values — intersection roots, reflect/refract,
Schlick)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.ops import vecmath as vm


def test_dot_cross_orthogonality():
    a = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [4.0, 5.0, 6.0]])
    np.testing.assert_allclose(vm.dot(a, b), [0.0, 32.0], rtol=1e-6)
    c = vm.cross(a, b)
    np.testing.assert_allclose(vm.dot(c, a), [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(vm.dot(c, b), [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(c[0], [0.0, 0.0, 1.0], atol=1e-6)


def test_unit_vector_and_zero_safety():
    v = jnp.asarray([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    u = vm.unit_vector(v)
    np.testing.assert_allclose(u[0], [0.6, 0.0, 0.8], rtol=1e-6)
    np.testing.assert_allclose(u[1], [0.0, 0.0, 0.0])  # no NaN on zero input

    # gradient through the zero lane must be finite (zero), not NaN
    g = jax.grad(lambda x: jnp.sum(vm.unit_vector(x)))(v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_reflect_closed_form():
    # 45-degree incidence onto the y=0 plane (reference: src/gpu/vec3.h:111-113)
    v = jnp.asarray([[1.0, -1.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.reflect(v, n)[0], [1.0, 1.0, 0.0], atol=1e-6)


def test_refract_snell_closed_form():
    # Air->glass (eta ratio 1/1.5) at 45 deg: sin(theta_t) = sin(45)/1.5
    uv = vm.unit_vector(jnp.asarray([[1.0, -1.0, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    ratio = jnp.asarray([1.0 / 1.5])
    out = vm.refract(uv, n, ratio)[0]
    sin_t = float(out[0]) / float(jnp.linalg.norm(out))
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)
    # refracted ray is unit length when inputs are unit (perp/parallel decomposition)
    np.testing.assert_allclose(jnp.linalg.norm(out), 1.0, rtol=1e-5)


def test_refract_total_internal_reflection_is_finite():
    # glass->air at grazing angle: k < 0; output must stay finite (caller
    # selects the reflect branch for these lanes)
    uv = vm.unit_vector(jnp.asarray([[1.0, -0.1, 0.0]]))
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = vm.refract(uv, n, jnp.asarray([1.5]))
    assert np.all(np.isfinite(np.asarray(out)))
    g = jax.grad(lambda r: jnp.sum(vm.refract(uv, n, r)))(jnp.asarray([1.5]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ray_at():
    o = jnp.asarray([[1.0, 2.0, 3.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(vm.ray_at(o, d, jnp.asarray([2.5]))[0], [1.0, 4.5, 3.0])


def test_near_zero():
    v = jnp.asarray([[1e-9, 1e-9, 1e-9], [1e-3, 0.0, 0.0]])
    np.testing.assert_array_equal(vm.near_zero(v), [True, False])
