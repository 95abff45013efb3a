"""End-to-end render tests: sky gradient, minimum slice, determinism,
chunk-layout invariance, and the color pipeline
(SURVEY.md §7 step 3: the minimum end-to-end slice)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.ops.image import to_uint8
from ray_tracing_in_one_weekend_tpu.ops.render import render
from ray_tracing_in_one_weekend_tpu.utils import ppm

KEY = jax.random.key(0)


def _cam(width=64, spp=2, **kw):
    kw.setdefault("aspect_ratio", 2.0)
    kw.setdefault("lookfrom", (0.0, 0.0, 0.0))
    kw.setdefault("lookat", (0.0, 0.0, -1.0))
    kw.setdefault("vfov_degrees", 90.0)
    kw.setdefault("defocus_angle_degrees", 0.0)
    kw.setdefault("focus_dist", 1.0)
    return make_camera(image_width=width, samples_per_pixel=spp, max_depth=8, **kw)


def test_sky_only_gradient():
    """Empty scene -> pure sky gradient: white at bottom, blue at top
    (reference: src/gpu/camera.h:119-123)."""
    sc = scene_lib.from_spheres(
        centers=[[0.0, 0.0, 0.0]], radii=[0.1], mat_types=[0], pad_to=8
    )
    sc = sc.replace(active=jnp.zeros_like(sc.active))  # deactivate everything
    cam = _cam(width=32, spp=4)
    img = np.asarray(render(sc, cam, KEY, chunk_size=128))
    assert img.shape == (16, 32, 3)
    # top row bluer than bottom row
    top, bottom = img[0].mean(axis=0), img[-1].mean(axis=0)
    assert top[2] > top[0]  # blue dominant
    assert bottom.min() > 0.8  # near white
    # blue channel is always 1.0 in the lerp; r <= g <= b everywhere
    np.testing.assert_allclose(img[..., 2], 1.0, atol=0.02)
    assert np.all(img[..., 0] <= img[..., 1] + 1e-5)
    assert np.all(img[..., 1] <= img[..., 2] + 1e-5)


def test_single_sphere_slice():
    """Sphere visible in the middle, darker than sky, sky at the edges."""
    sc = scene_lib.single_sphere_scene(pad_to=8)
    cam = _cam(width=64, spp=4)
    img = np.asarray(render(sc, cam, KEY, chunk_size=256))
    h, w = img.shape[:2]
    center = img[h // 2 - 2 : h // 2 + 2, w // 2 - 2 : w // 2 + 2].mean()
    corner = img[0, 0].mean()
    assert center < corner  # gray sphere darker than sky
    assert img.min() >= 0.0 and img.max() <= 1.0 + 1e-5


def test_deterministic_and_chunk_invariant():
    sc = scene_lib.single_sphere_scene(pad_to=8)
    cam = _cam(width=32, spp=2)
    a = np.asarray(render(sc, cam, KEY, chunk_size=64))
    b = np.asarray(render(sc, cam, KEY, chunk_size=64))
    np.testing.assert_array_equal(a, b)  # determinism
    c = np.asarray(render(sc, cam, KEY, chunk_size=512))
    np.testing.assert_allclose(a, c, atol=1e-6)  # chunk-layout invariance
    d = np.asarray(render(sc, cam, jax.random.key(1), chunk_size=64))
    assert np.abs(a - d).max() > 1e-4  # different seed -> different noise


def test_spp_reduces_variance():
    sc = scene_lib.single_sphere_scene(pad_to=8)
    cam_lo = _cam(width=32, spp=2)
    cam_hi = _cam(width=32, spp=32)
    img_lo1 = np.asarray(render(sc, cam_lo, jax.random.key(1), chunk_size=512))
    img_lo2 = np.asarray(render(sc, cam_lo, jax.random.key(2), chunk_size=512))
    img_hi1 = np.asarray(render(sc, cam_hi, jax.random.key(1), chunk_size=512))
    img_hi2 = np.asarray(render(sc, cam_hi, jax.random.key(2), chunk_size=512))
    # seed-to-seed deviation shrinks with spp (the reference's
    # merge-workflow convergence property, SURVEY.md §2.2 sample-axis row)
    assert np.abs(img_hi1 - img_hi2).mean() < np.abs(img_lo1 - img_lo2).mean()


def test_defocus_blurs_off_focus_objects():
    # spp must be high enough that edge energy measures the silhouette,
    # not per-pixel Monte-Carlo noise (which defocus sampling adds).
    sc = scene_lib.single_sphere_scene(pad_to=8)
    sharp_cam = _cam(width=32, spp=256, defocus_angle_degrees=0.0, focus_dist=1.0)
    blur_cam = _cam(width=32, spp=256, defocus_angle_degrees=20.0, focus_dist=3.0)
    sharp = np.asarray(render(sc, sharp_cam, KEY, chunk_size=512))
    blur = np.asarray(render(sc, blur_cam, KEY, chunk_size=512))

    # blurred image has softer edges -> lower gradient magnitude, both in
    # total and at the sharpest single transition (the sphere silhouette)
    def hgrad(img):
        return np.abs(np.diff(img, axis=1))

    assert hgrad(blur).sum() < hgrad(sharp).sum()
    assert hgrad(blur).max() < hgrad(sharp).max()


def test_to_uint8_pipeline():
    lin = jnp.asarray([[[0.0, 0.25, 1.0], [2.0, -1.0, 0.5]]])
    out = np.asarray(to_uint8(lin))
    # sqrt -> clamp 0.999 -> *256 (reference: src/gpu/color.h:16-38)
    assert out.tolist() == [[[0, 128, 255], [255, 0, 181]]]


def test_ppm_roundtrip():
    img = (np.arange(2 * 3 * 3) % 256).astype(np.uint8).reshape(2, 3, 3)
    data = ppm.encode_p3(img)
    assert data.startswith(b"P3\n3 2\n255\n")
    back = ppm.read_ppm(data)
    np.testing.assert_array_equal(back, img)


def test_cover_scene_shape_and_materials():
    sc = scene_lib.cover_scene(0)
    assert sc.num_slots == 512
    n_active = int(sc.num_active)
    assert 450 <= n_active <= 488  # 488 minus rejected grid cells
    # ground sphere
    np.testing.assert_allclose(np.asarray(sc.center[0]), [0.0, -1000.0, 0.0])
    assert float(sc.radius[0]) == 1000.0
    # heroes
    assert int(sc.mat_type[1]) == scene_lib.DIELECTRIC
    assert int(sc.mat_type[2]) == scene_lib.LAMBERTIAN
    assert int(sc.mat_type[3]) == scene_lib.METAL
    # material mix roughly 80/15/5 among active grid spheres
    grid = slice(4, 488)
    active = np.asarray(sc.active[grid])
    mats = np.asarray(sc.mat_type[grid])[active]
    frac_lam = (mats == scene_lib.LAMBERTIAN).mean()
    assert 0.7 < frac_lam < 0.9
    # deterministic
    sc2 = scene_lib.cover_scene(0)
    np.testing.assert_array_equal(np.asarray(sc.center), np.asarray(sc2.center))
