"""Gradient correctness: autodiff vs central finite differences.

BASELINE.json's parity metric is "pixel + gradient allclose": gradients
of rendered pixels w.r.t. every continuous scene parameter (center,
radius, albedo, fuzz, ior) must match finite differences of the SAME
deterministic render (same keys -> same sample paths, so the FD quotient
is taken on a smooth function of the parameters away from visibility
discontinuities).

Scenes/pixels are chosen so the perturbation does not flip any discrete
decision (hit selection, material branch, TIR): interior pixels, modest
epsilons. At silhouettes the true derivative has a Dirac component that
neither autodiff nor FD of a fixed sample set can see — that is the
documented Monte-Carlo-discrete semantics (SURVEY.md §7 step 5), same as
any vanilla differentiable ray tracer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.ops.render import render

KEY = jax.random.key(11)


def _cam(width=24, spp=2, depth=4):
    return make_camera(
        image_width=width,
        aspect_ratio=2.0,
        samples_per_pixel=spp,
        max_depth=depth,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )


def _scene():
    # lambertian + metal + dielectric, all visible
    return scene_lib.from_spheres(
        centers=[[0.0, -100.5, -1.0], [0.0, 0.0, -1.0], [-1.0, 0.0, -1.0], [1.0, 0.0, -1.0]],
        radii=[100.0, 0.5, 0.5, 0.5],
        mat_types=[0, 0, 2, 1],
        albedos=[[0.8, 0.8, 0.0], [0.1, 0.2, 0.5], [1.0, 1.0, 1.0], [0.8, 0.6, 0.2]],
        fuzzes=[0.0, 0.0, 0.0, 0.2],
        iors=[1.5, 1.5, 1.5, 1.5],
        pad_to=8,
    )


def _loss_fn(field, cam, weight_img=None):
    """Scalar function of one scene field; deterministic in the field."""
    base = _scene()

    def f(value):
        sc = base.replace(**{field: value})
        img = render(sc, cam, KEY, chunk_size=512, differentiable=True)
        if weight_img is not None:
            return jnp.mean(img * weight_img)
        # mean, not sum: keeps |f| ~ 0.5 so the float32 ulp of f does not
        # swamp the central-difference numerator at small eps.
        return jnp.mean(img)

    return f, getattr(base, field)


def _check_fd(field, eps, atol, rtol, indices):
    cam = _cam()
    f, x0 = _loss_fn(field, cam)
    g = jax.grad(f)(x0)
    g = np.asarray(g)
    assert np.all(np.isfinite(g)), f"non-finite grad for {field}"

    f_np = lambda v: float(f(jnp.asarray(v)))
    for idx in indices:
        x_plus = np.asarray(x0).copy()
        x_plus[idx] += eps
        x_minus = np.asarray(x0).copy()
        x_minus[idx] -= eps
        fd = (f_np(x_plus) - f_np(x_minus)) / (2 * eps)
        ad = g[idx]
        assert np.isclose(ad, fd, atol=atol, rtol=rtol), (
            f"{field}[{idx}]: autodiff {ad:.6f} vs FD {fd:.6f}"
        )


def test_albedo_gradients_match_fd():
    # albedo is linear in the radiance: tight tolerance
    _check_fd("albedo", eps=1e-3, atol=1e-5, rtol=0.02,
              indices=[(0, 0), (0, 1), (1, 2), (3, 0)])


def test_center_gradients_match_fd():
    # geometry parameters: eps must clear float32 quotient noise without
    # crossing a silhouette (see the eps survey in the module docstring)
    _check_fd("center", eps=3e-4, atol=2e-4, rtol=0.2,
              indices=[(1, 0), (1, 1), (1, 2)])


def test_radius_gradients_match_fd():
    _check_fd("radius", eps=3e-4, atol=2e-4, rtol=0.2, indices=[(1,), (0,)])


def test_fuzz_gradients_match_fd():
    _check_fd("fuzz", eps=1e-3, atol=1e-4, rtol=0.1, indices=[(3,)])


def test_ior_gradients_match_fd():
    _check_fd("ior", eps=1e-3, atol=1e-4, rtol=0.1, indices=[(2,)])


def test_jvp_vjp_consistency():
    """Forward-mode and reverse-mode derivatives of the render agree to
    float tolerance in random directions — a noise-free consistency
    check complementing the FD tests (FD validates the math; this
    validates the two autodiff transposes against each other)."""
    cam = _cam()
    base = _scene()
    fields = ("center", "radius", "albedo", "fuzz", "ior")

    def f(params):
        img = render(
            base.replace(**params), cam, KEY, chunk_size=512, differentiable=True
        )
        return jnp.mean(img)

    params = {k: getattr(base, k) for k in fields}
    tangent = {
        k: jax.random.normal(jax.random.fold_in(KEY, i), v.shape, v.dtype)
        for i, (k, v) in enumerate(params.items())
    }
    _, jvp_val = jax.jvp(f, (params,), (tangent,))
    grads = jax.grad(f)(params)
    vjp_val = sum(
        float(jnp.sum(grads[k] * tangent[k])) for k in fields
    )
    assert np.isclose(float(jvp_val), vjp_val, rtol=1e-3, atol=1e-6), (
        f"jvp {float(jvp_val):.8f} vs vjp {vjp_val:.8f}"
    )


def test_gradients_finite_on_cover_scene():
    """Full 512-slot cover scene: one backward pass, all-finite grads on
    every differentiable field (NaN-robustness of the masked kernels)."""
    sc = scene_lib.cover_scene(0)
    cam = make_camera(
        image_width=32, aspect_ratio=2.0, samples_per_pixel=1, max_depth=6
    )

    def loss(params):
        img = render(
            sc.replace(**params), cam, KEY, chunk_size=256, differentiable=True
        )
        return jnp.mean(img**2)

    params = {f: getattr(sc, f) for f in ("center", "radius", "albedo", "fuzz", "ior")}
    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert bool(jnp.all(jnp.isfinite(g))), f"non-finite grad in {name}"
    # something nonzero flowed
    total = sum(float(jnp.abs(g).sum()) for g in grads.values())
    assert total > 0.0
