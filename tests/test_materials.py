"""Material scatter semantics (reference: src/gpu/material.h:20-104)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.ops.intersect import hit_scene
from ray_tracing_in_one_weekend_tpu.ops.materials import scatter, schlick_reflectance

KEY = jax.random.key(7)


def _keys(n):
    return jax.vmap(lambda i: jax.random.fold_in(KEY, i))(jnp.arange(n))


def _hit(mat_type, fuzz=0.0, ior=1.5, n=256, origin_z=-3.0):
    sc = scene_lib.from_spheres(
        centers=[[0.0, 0.0, 0.0]],
        radii=[1.0],
        mat_types=[mat_type],
        albedos=[[0.8, 0.6, 0.2]],
        fuzzes=[fuzz],
        iors=[ior],
        pad_to=8,
    )
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, origin_z]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    return hit_scene(sc, o, d), d


def test_lambertian_cosine_ish_distribution_and_albedo():
    rec, d = _hit(scene_lib.LAMBERTIAN, n=4096)
    dirs, atten, ok = scatter(rec, d, _keys(4096))
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(atten), [[0.8, 0.6, 0.2]] * 4096)
    # normal + unit vector: every scatter is within the unit ball around
    # the normal -> dot(dir, normal) in [0, 2], mean 1 for unit normal
    cos = np.sum(np.asarray(dirs) * np.asarray(rec.normal), axis=-1)
    assert cos.min() >= -1e-4
    np.testing.assert_allclose(cos.mean(), 1.0, atol=0.05)


def test_metal_mirror_when_fuzz_zero():
    rec, d = _hit(scene_lib.METAL, fuzz=0.0, n=4)
    dirs, atten, ok = scatter(rec, d, _keys(4))
    # head-on: reflect (0,0,1) about normal (0,0,-1) -> (0,0,-1)
    np.testing.assert_allclose(np.asarray(dirs), [[0.0, 0.0, -1.0]] * 4, atol=1e-6)
    assert np.all(np.asarray(ok))


def test_metal_absorbs_below_surface():
    # huge fuzz -> some scattered dirs point into the surface -> ok=False
    rec, d = _hit(scene_lib.METAL, fuzz=1.0, n=4096)
    # grazing incidence to maximize absorption probability
    d_graze = jnp.broadcast_to(
        jnp.asarray([0.999, -0.045, 0.0]), (4096, 3)
    )
    dirs, atten, ok = scatter(rec, d_graze, _keys(4096))
    ok = np.asarray(ok)
    assert (~ok).sum() > 0  # some rays absorbed
    # absorbed iff scattered direction is not above the surface
    cos = np.sum(np.asarray(dirs) * np.asarray(rec.normal), axis=-1)
    np.testing.assert_array_equal(ok, cos > 0)


def test_dielectric_head_on_mostly_refracts_straight():
    rec, d = _hit(scene_lib.DIELECTRIC, n=4096)
    dirs, atten, ok = scatter(rec, d, _keys(4096))
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(atten), 1.0)
    # head-on: refraction keeps direction (0,0,1); Schlick r0 = 0.04
    straight = np.sum(np.asarray(dirs) * np.array([0.0, 0.0, 1.0]), axis=-1) > 0.999
    frac_reflect = 1.0 - straight.mean()
    r0 = schlick_reflectance(jnp.asarray(1.0), jnp.asarray(1.0 / 1.5))
    np.testing.assert_allclose(frac_reflect, float(r0), atol=0.02)


def test_dielectric_total_internal_reflection():
    # Ray inside glass hitting the surface at a grazing angle: ior=1.5,
    # sin(theta) > 1/1.5 -> must reflect, never refract.
    sc = scene_lib.from_spheres(
        centers=[[0.0, 0.0, 0.0]],
        radii=[1.0],
        mat_types=[scene_lib.DIELECTRIC],
        pad_to=8,
    )
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (n, 3))  # inside
    # aim near-tangentially: hits back wall at a steep local angle
    d = jnp.broadcast_to(jnp.asarray([0.995, 0.0999, 0.0]), (n, 3))
    rec = hit_scene(sc, o / jnp.linalg.norm(d), d)
    rec_dirs, _, _ = scatter(rec, d, _keys(n))
    # all lanes take the same (deterministic geometry) branch; verify
    # scattered dirs equal the mirror reflection for every lane
    spread = np.asarray(rec_dirs).std(axis=0).max()
    assert not bool(rec.front_face[0])
    # TIR occurs when ratio*sin > 1
    import math

    unit_d = np.asarray(d[0]) / np.linalg.norm(np.asarray(d[0]))
    cos = min(-np.dot(unit_d, np.asarray(rec.normal[0])), 1.0)
    sin = math.sqrt(1 - cos * cos)
    if 1.5 * sin > 1.0:
        assert spread < 1e-6  # deterministic reflect: no randomness


def test_schlick_closed_form():
    # normal incidence, n=1.5: r0 = ((1-1.5)/(1+1.5))^2 = 0.04
    np.testing.assert_allclose(
        float(schlick_reflectance(jnp.asarray(1.0), jnp.asarray(1.5))), 0.04, rtol=1e-5
    )
    # grazing: cos=0 -> reflectance -> 1
    np.testing.assert_allclose(
        float(schlick_reflectance(jnp.asarray(0.0), jnp.asarray(1.5))), 1.0, rtol=1e-5
    )


def test_gradients_flow_through_scatter_params():
    rec, d = _hit(scene_lib.METAL, fuzz=0.3, n=64)
    keys = _keys(64)

    def f(fuzz):
        dirs, _, _ = scatter(rec.replace(fuzz=jnp.broadcast_to(fuzz, rec.fuzz.shape)), d, keys)
        return jnp.sum(dirs**2)

    g = jax.grad(f)(jnp.asarray(0.3))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
