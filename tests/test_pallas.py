"""Pallas render kernel vs the pure-jnp oracle (interpret mode on CPU).

The kernel's PCG sample streams differ from the jnp path's threefry
streams, so agreement is statistical: per-channel image means converge
to the same values, and per-pixel differences stay within Monte-Carlo
noise at the test spp. Geometry-deterministic scenes (fuzz-0 metal
mirror, sky-only) agree to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.ops.pallas_render import pack_scene, render_pallas
from ray_tracing_in_one_weekend_tpu.ops.render import render

KEY = jax.random.key(0)


def _cam(width=32, spp=8, **kw):
    kw.setdefault("aspect_ratio", 2.0)
    kw.setdefault("lookfrom", (0.0, 0.0, 0.0))
    kw.setdefault("lookat", (0.0, 0.0, -1.0))
    kw.setdefault("vfov_degrees", 90.0)
    kw.setdefault("defocus_angle_degrees", 0.0)
    kw.setdefault("focus_dist", 1.0)
    kw.setdefault("max_depth", 6)
    return make_camera(image_width=width, samples_per_pixel=spp, **kw)


def test_pack_scene_layout():
    sc = scene_lib.three_sphere_scene(pad_to=128)
    p = np.asarray(pack_scene(sc))
    assert p.shape == (16, 128)
    np.testing.assert_allclose(p[0:3, 1], [0.0, 0.0, -1.0])  # center sphere
    act = p[11].astype(bool)
    np.testing.assert_allclose(p[4, act], p[3, act] ** 2)  # r^2 row
    # padding slots are analytically unhittable: center 0, r^2 = -1
    np.testing.assert_allclose(p[4, ~act], -1.0)
    np.testing.assert_allclose(p[0:3, ~act], 0.0)
    assert p[11, :4].sum() == 4.0 and p[11, 4:].sum() == 0.0  # active mask
    # homogeneous o-term rows: (-2c, |c|^2 - r^2)
    np.testing.assert_allclose(p[12:15], -2.0 * p[0:3])
    np.testing.assert_allclose(
        p[15], (p[0:3] ** 2).sum(axis=0) - p[4], rtol=1e-6
    )


def test_sky_only_matches_exactly():
    """No spheres -> no RNG influence on radiance; paths agree to float
    tolerance (both compute the same deterministic sky gradient; jitter
    wiggles the direction but 1 pixel of 16x8 at 16spp averages out)."""
    sc = scene_lib.single_sphere_scene(pad_to=128)
    sc = sc.replace(active=jnp.zeros_like(sc.active))
    cam = _cam(width=16, spp=16)
    img_p = np.asarray(render_pallas(sc, cam, seed=0, tile=128, interpret=True))
    img_j = np.asarray(render(sc, cam, KEY, chunk_size=128))
    assert np.abs(img_p - img_j).max() < 0.02  # jitter-noise tolerance
    np.testing.assert_allclose(img_p[..., 2], 1.0, atol=0.02)  # blue channel


def test_single_sphere_statistical_parity():
    sc = scene_lib.single_sphere_scene(pad_to=128)
    cam = _cam(width=32, spp=32)
    img_p = np.asarray(render_pallas(sc, cam, seed=0, tile=256, interpret=True))
    img_j = np.asarray(render(sc, cam, KEY, chunk_size=512))
    # channel means agree well below the per-pixel noise floor
    np.testing.assert_allclose(
        img_p.mean(axis=(0, 1)), img_j.mean(axis=(0, 1)), atol=0.01
    )
    assert np.abs(img_p - img_j).mean() < 0.03


def test_three_sphere_materials_parity():
    """Metal + dielectric + lambertian trio: material code agreement."""
    sc = scene_lib.three_sphere_scene(pad_to=128)
    cam = _cam(width=32, spp=32, lookfrom=(0.0, 0.0, 0.5), focus_dist=1.5)
    img_p = np.asarray(render_pallas(sc, cam, seed=0, tile=256, interpret=True))
    img_j = np.asarray(render(sc, cam, KEY, chunk_size=512))
    np.testing.assert_allclose(
        img_p.mean(axis=(0, 1)), img_j.mean(axis=(0, 1)), atol=0.015
    )


def test_seed_changes_noise_not_signal():
    sc = scene_lib.single_sphere_scene(pad_to=128)
    cam = _cam(width=16, spp=8)
    a = np.asarray(render_pallas(sc, cam, seed=0, tile=128, interpret=True))
    b = np.asarray(render_pallas(sc, cam, seed=0, tile=128, interpret=True))
    np.testing.assert_array_equal(a, b)  # deterministic given seed
    c = np.asarray(render_pallas(sc, cam, seed=1, tile=128, interpret=True))
    assert np.abs(a - c).max() > 1e-4  # different noise
    np.testing.assert_allclose(
        a.mean(axis=(0, 1)), c.mean(axis=(0, 1)), atol=0.02
    )  # same signal


def test_tile_layout_invariance():
    """Tile size changes the grid decomposition but not pixel streams
    (streams key on GLOBAL pixel index)."""
    sc = scene_lib.single_sphere_scene(pad_to=128)
    cam = _cam(width=32, spp=4)
    a = np.asarray(render_pallas(sc, cam, seed=0, tile=128, interpret=True))
    b = np.asarray(render_pallas(sc, cam, seed=0, tile=256, interpret=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_tail_compaction_bit_identical():
    """The budgeted/compacted schedule only reorders lane work; radiance
    per (pixel, sample) is keyed by global ids, so any (n_passes, budget)
    gives the bit-identical image."""
    sc = scene_lib.three_sphere_scene(pad_to=128)
    cam = _cam(width=32, spp=8, lookfrom=(0.0, 0.0, 0.5), focus_dist=1.5)
    base = np.asarray(
        render_pallas(sc, cam, seed=0, tile=128, interpret=True, n_passes=1)
    )
    # A tiny budget forces real compaction work across all passes.
    compacted = np.asarray(
        render_pallas(
            sc, cam, seed=0, tile=128, interpret=True, n_passes=4, budget=3
        )
    )
    np.testing.assert_array_equal(base, compacted)


def test_hollow_glass_negative_radius_parity():
    """The book's hollow-glass trick: a dielectric sphere with NEGATIVE
    radius nested inside a positive one flips the outward normal inward
    via (p - c) / radius (reference: src/gpu/sphere.h:40-42). The kernel
    must honour the radius sign like the jnp path does."""
    sc = scene_lib.from_spheres(
        centers=[[0, -100.5, -1], [0, 0, -1], [0, 0, -1], [-1, 0, -1], [1, 0, -1]],
        radii=[100.0, 0.5, -0.45, 0.5, 0.5],
        mat_types=[0, 2, 2, 0, 1],
        albedos=[[0.8, 0.8, 0.0], [1, 1, 1], [1, 1, 1], [0.1, 0.2, 0.5], [0.8, 0.6, 0.2]],
        pad_to=128,
    )
    cam = _cam(width=32, spp=24, max_depth=16)
    img_p = np.asarray(render_pallas(sc, cam, seed=0, tile=256, interpret=True))
    img_j = np.asarray(render(sc, cam, KEY, chunk_size=512))
    assert np.isfinite(img_p).all()
    np.testing.assert_allclose(
        img_p.mean(axis=(0, 1)), img_j.mean(axis=(0, 1)), atol=0.015
    )
    # The hollow shell must actually transmit: the sphere's silhouette
    # region is not black (a broken inward normal absorbs/darkens it).
    h, w = img_p.shape[:2]
    assert img_p[h // 2, w // 2].mean() > 0.1


def test_defocus_blur_pallas():
    sc = scene_lib.single_sphere_scene(pad_to=128)
    sharp_cam = _cam(width=32, spp=64, defocus_angle_degrees=0.0, focus_dist=1.0)
    blur_cam = _cam(width=32, spp=64, defocus_angle_degrees=20.0, focus_dist=3.0)
    sharp = np.asarray(render_pallas(sc, sharp_cam, seed=0, tile=256, interpret=True))
    blur = np.asarray(render_pallas(sc, blur_cam, seed=0, tile=256, interpret=True))

    def hgrad(img):
        return np.abs(np.diff(img, axis=1))

    assert hgrad(blur).max() < hgrad(sharp).max()
