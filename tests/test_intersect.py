"""Closed-form intersection tests (quadratic roots, nearest-root
selection, face orientation) mirroring sphere::hit semantics
(reference: src/gpu/sphere.h:15-44)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.ops.intersect import T_MISS, hit_scene, sphere_hit_ts


def _unit_scene():
    # unit sphere at origin + a second sphere behind the camera
    return scene_lib.from_spheres(
        centers=[[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]],
        radii=[1.0, 1.0],
        mat_types=[0, 1],
        albedos=[[0.1, 0.2, 0.3], [0.9, 0.8, 0.7]],
        pad_to=8,
    )


def test_head_on_hit_nearest_root():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    rec = hit_scene(sc, o, d)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-6)  # near root, not 4
    np.testing.assert_allclose(np.asarray(rec.point[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0.0, 0.0, -1.0], atol=1e-6)
    assert bool(rec.front_face[0])
    assert int(rec.sphere_index[0]) == 0
    np.testing.assert_allclose(np.asarray(rec.albedo[0]), [0.1, 0.2, 0.3], rtol=1e-6)


def test_inside_sphere_uses_far_root_and_flips_normal():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 0.0, 0.0]])  # inside the unit sphere
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    rec = hit_scene(sc, o, d)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, rtol=1e-6)
    assert not bool(rec.front_face[0])
    # normal faces against the ray (reference: src/gpu/hittable.h:18-26)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0.0, 0.0, -1.0], atol=1e-6)


def test_miss_and_grazing():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 2.0, -3.0], [0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])  # parallel above; perpendicular
    rec = hit_scene(sc, o, d)
    assert not bool(rec.hit[0])
    assert not bool(rec.hit[1])


def test_closest_hit_picks_nearest_of_two():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])  # would hit both spheres
    ts = sphere_hit_ts(sc, o, d)
    assert float(ts[0, 0]) < float(ts[0, 1]) < T_MISS
    rec = hit_scene(sc, o, d)
    assert int(rec.sphere_index[0]) == 0


def test_t_min_epsilon_skips_self_hit():
    """A ray starting exactly on the surface must not re-hit it at t=0
    (shadow acne, reference: src/gpu/camera.h:118 / gallery
    shadow-acne-example.png)."""
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 0.0, -1.0]])  # on the surface
    d = jnp.asarray([[0.0, 0.0, -1.0]])  # leaving the sphere
    rec = hit_scene(sc, o, d)
    assert not bool(rec.hit[0])


def test_inactive_slots_never_hit():
    sc = _unit_scene()  # slots 2..7 are padding
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    ts = sphere_hit_ts(sc, o, d)
    assert np.all(np.asarray(ts[0, 2:]) == T_MISS)


def test_gradients_flow_to_center_and_radius():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])

    def t_of_scene(center, radius):
        s = sc.replace(center=center, radius=radius)
        return hit_scene(s, o, d).t[0]

    gc, gr = jax.grad(t_of_scene, argnums=(0, 1))(sc.center, sc.radius)
    gc, gr = np.asarray(gc), np.asarray(gr)
    assert np.all(np.isfinite(gc)) and np.all(np.isfinite(gr))
    # head-on: t = |z_c - z_o| - r -> dt/dr = -1, dt/dz_center = +1
    np.testing.assert_allclose(gr[0], -1.0, rtol=1e-4)
    np.testing.assert_allclose(gc[0, 2], 1.0, rtol=1e-4)
    # non-hit spheres get exactly zero gradient, never NaN
    np.testing.assert_array_equal(gc[1:], 0.0)
    np.testing.assert_array_equal(gr[1:], 0.0)


def test_miss_lanes_have_finite_zero_gradients():
    sc = _unit_scene()
    o = jnp.asarray([[0.0, 5.0, -3.0]])  # misses everything
    d = jnp.asarray([[0.0, 0.0, 1.0]])

    def f(center):
        rec = hit_scene(sc.replace(center=center), o, d)
        return jnp.sum(jnp.where(rec.hit[:, None], rec.point, 0.0))

    g = np.asarray(jax.grad(f)(sc.center))
    assert np.all(np.isfinite(g))
    np.testing.assert_array_equal(g, 0.0)
