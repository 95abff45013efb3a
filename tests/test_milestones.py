"""Book-milestone fixtures vs the reference's committed gallery renders.

The reference ships one golden PNG per book milestone
(gallery/cpu/image1..21.png) with the generating code in
archive/listing1..70 — its de-facto fixtures (SURVEY.md §4). These
tests render the intermediate milestones LIVE (models/milestones.py,
each scene citing its archive listing) and compare block-mean
statistics against the corresponding committed gallery image, the
protocol of tests/test_golden.py::test_cover_scene_golden_image_parity:
both images are downscaled to a 12x6 block grid of linear-radiance
means, where Monte-Carlo noise averages out and any geometry, material,
shading-model or gamma bug shifts whole blocks.

Coverage: 17 of the 21 committed CPU-gallery goldens have fixtures here
(image21's content is pinned at full fidelity by
tests/test_golden_fullres.py; the documented gaps are image6 and the
double-precision acne pair 7/8 — see the section comments below).

Pairing + tolerance calibration (measured block MAD at 192x108, CPU):
gradient->image1 EXACT, sky->image2 0.0008, red-sphere->image3 0.0009,
single-normals->image4 0.0009, normals->image5 0.0006,
gray-lambertian->image9 0.0017, hemisphere-diffuse->image10 0.0017,
sharp-metal-trio->image11 0.0016, fuzzed-metal-trio->image12 0.0067,
always-refract->image14 0.0061, glass-trio->image15 0.0079,
hollow-glass-trio->image16 0.0045, two-sphere-wide->image17 0.0019,
positioned-90->image18 0.0017, positioned-20->image19 0.0017,
defocus->image20 0.0015. The nearest WRONG pairing measured >= 0.05
(camera arc: >= 0.11) in every case, so the thresholds below (~2.5-4x
measured) discriminate cleanly. Tests skip when the reference tree is
absent.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import milestones as M
from ray_tracing_in_one_weekend_tpu.ops.render import render_image

_REF_GALLERY = "/root/reference/gallery/cpu"

KEY = jax.random.key(0)
GRID = (12, 6)  # (blocks across, blocks down)


def _blocks(img: np.ndarray) -> np.ndarray:
    gw, gh = GRID
    h, w = img.shape[:2]
    bh, bw = h // gh, w // gw
    img = img[: gh * bh, : gw * bw].reshape(gh, bh, gw, bw, 3)
    return img.mean(axis=(1, 3))


def _ref_blocks(image_n: int, gamma: bool = True) -> np.ndarray:
    Image = pytest.importorskip("PIL.Image")
    path = os.path.join(_REF_GALLERY, f"image{image_n}.png")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    a = np.asarray(Image.open(path))[..., :3].astype(np.float64) / 255.0
    # The gallery PNGs store write_color's output; gamma-2 encoding
    # exists from archive/listing35/color.h on, so invert it to linear
    # for the listings after that (and not for the earlier ones).
    return _blocks(a**2 if gamma else a)


def _cam(spp=12):
    return M.book_camera(image_width=192, spp=spp, max_depth=20)


def test_normals_sphere_matches_gallery_image5():
    """Normals shading (archive/listing24); PRE-gamma golden."""
    img = np.asarray(M.render_normals(M.sphere_ground_scene(), _cam(), KEY, spp=4))
    mad = np.abs(_blocks(img) - _ref_blocks(5, gamma=False)).mean()
    assert mad < 0.005, f"normals block MAD {mad:.4f}"


def test_gray_lambertian_matches_gallery_image9():
    """First correct lambertian diffuse + gamma (archive/listing30-35
    era) through the REAL integrator with 0.5-gray materials."""
    img = np.asarray(render_image(M.sphere_ground_scene(), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(9)).mean()
    assert mad < 0.006, f"gray lambertian block MAD {mad:.4f}"


def test_hemisphere_diffuse_matches_gallery_image10():
    """The interim hemisphere-scattering model (archive/listing40) —
    brighter than true lambertian; the fixture must match ITS golden
    (image10) and not the lambertian one (image9 gap measured 0.0088)."""
    img = np.asarray(
        M.render_hemisphere_diffuse(
            M.sphere_ground_scene(), _cam(), KEY, spp=12, max_depth=20
        )
    )
    mad = np.abs(_blocks(img) - _ref_blocks(10)).mean()
    assert mad < 0.006, f"hemisphere diffuse block MAD {mad:.4f}"


def test_sharp_metal_trio_matches_gallery_image11():
    """First metal tableau, fuzz 0 (archive/listing50/main.cc:15-23)."""
    img = np.asarray(render_image(M.metal_trio_scene(), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(11)).mean()
    assert mad < 0.006, f"sharp metal block MAD {mad:.4f}"


def test_fuzzed_metal_trio_matches_gallery_image12():
    """Fuzzed metal, fuzz 0.3 / 1.0 (archive/listing52/main.cc:55-56)."""
    img = np.asarray(render_image(M.metal_trio_scene(0.3, 1.0), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(12)).mean()
    assert mad < 0.016, f"fuzzed metal block MAD {mad:.4f}"


def test_glass_trio_matches_gallery_image15():
    """Solid-glass dielectric tableau (archive/listing59/main.cc:53-61)."""
    img = np.asarray(render_image(M.glass_trio_scene(), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(15)).mean()
    assert mad < 0.02, f"glass trio block MAD {mad:.4f}"


def test_hollow_glass_trio_matches_gallery_image16():
    """Hollow glass bubble via the negative-radius inner sphere — the
    book's air-gap trick, exercising the signed-radius normal flip
    (ops/intersect.py) on an intermediate milestone."""
    img = np.asarray(render_image(M.glass_trio_scene(hollow=True), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(16)).mean()
    assert mad < 0.012, f"hollow glass block MAD {mad:.4f}"


# ---------------------------------------------------------------------------
# Camera-milestone fixtures (VERDICT r4 item 5): the positionable-camera
# arc and the antialiasing/dielectric close-up.
# ---------------------------------------------------------------------------


def test_wide_fov_two_spheres_matches_gallery_image17():
    """The 90-degree-fov test scene: two touching R=cos(pi/4) spheres,
    blue/red (archive/listing63/main.cc:51-61; golden image17)."""
    img = np.asarray(render_image(M.two_sphere_wide_scene(), _cam(), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(17)).mean()
    assert mad < 0.006, f"two-sphere wide-fov block MAD {mad:.4f}"


def test_positioned_camera_wide_matches_gallery_image18():
    """Positioned camera, vfov 90, lookfrom (-2,2,1)
    (archive/listing65/main.cc:65; golden image18) over the hollow-glass
    trio — exercises the u/v/w basis at an off-axis viewpoint."""
    cam = M.positioned_camera(image_width=192, spp=12, max_depth=20,
                              vfov_degrees=90.0)
    img = np.asarray(render_image(M.glass_trio_scene(hollow=True), cam, KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(18)).mean()
    assert mad < 0.006, f"positioned-camera block MAD {mad:.4f}"


def test_positioned_camera_zoom_matches_gallery_image19():
    """Same viewpoint zoomed to vfov 20
    (archive/listing66/main.cc:65; golden image19)."""
    cam = M.positioned_camera(image_width=192, spp=12, max_depth=20,
                              vfov_degrees=20.0)
    img = np.asarray(render_image(M.glass_trio_scene(hollow=True), cam, KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(19)).mean()
    assert mad < 0.006, f"zoomed-camera block MAD {mad:.4f}"


def test_defocus_camera_matches_gallery_image20():
    """Defocus blur: lookfrom (3,3,2), aperture 2.0,
    focus_dist = |lookfrom - lookat| = sqrt(27)
    (archive/listing69/main.cc:65-71; golden image20) — the aperture
    parameterization and the lens-disk sampling path against a
    committed reference image."""
    import math

    cam = M.positioned_camera(
        image_width=192, spp=16, max_depth=20, vfov_degrees=20.0,
        lookfrom=(3.0, 3.0, 2.0), aperture=2.0,
        focus_dist=math.sqrt(27.0),
    )
    img = np.asarray(render_image(M.glass_trio_scene(hollow=True), cam, KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(20)).mean()
    assert mad < 0.006, f"defocus-camera block MAD {mad:.4f}"


def test_always_refract_dielectric_matches_gallery_image14():
    """The 'glass that always refracts' milestone: the listing55
    refraction tableau (two glass + fuzz-1.0 gold metal) under the
    fabs-form unconditional refract (archive/listing54/material.h +
    archive/listing53/vec3.h:126-131; golden image14). The modern
    Schlick dielectric measures 0.017 against this golden — this
    fixture pins the MILESTONE's distinct shading, not the final one."""
    cam = M.book_camera(image_width=192, spp=12, max_depth=20)
    img = np.asarray(
        M.render_v2_dielectric(M.refract_trio_scene(), cam, KEY,
                               spp=12, max_depth=20)
    )
    mad = np.abs(_blocks(img) - _ref_blocks(14)).mean()
    assert mad < 0.015, f"always-refract block MAD {mad:.4f}"


def test_antialias_closeup_statistics_gallery_image13():
    """The 200x100 close-up golden (gallery/cpu/image13 = gpu/image15,
    SURVEY §6 'antialiasing close-up' row): the refraction tableau
    rendered at the golden's own tiny resolution. The code that
    generated these two goldens is ABSENT from the reference archives
    (archive-gpu/image15 has no code directory; no cpu listing renders
    at 200x100), and its ringed dielectric matches none of the archived
    dielectric milestones — scene-exact parity is unreproducible by
    construction, so the checks are statistical (the same argument as
    tests/test_golden_fullres.py's gpu-preset test): identical camera
    geometry must reproduce the golden's sky band exactly and its
    ground band/global brightness closely, and the pixel-jitter path
    must actively antialias at this resolution."""
    import jax.numpy as jnp

    from ray_tracing_in_one_weekend_tpu.ops.image import to_uint8

    cam = M.book_camera(image_width=200, spp=16, max_depth=20,
                        aspect_ratio=2.0)
    img = M.render_v2_dielectric(M.refract_trio_scene(), cam, KEY,
                                 spp=16, max_depth=20, mode="tir_reflect")
    u8 = np.asarray(to_uint8(jnp.asarray(img))).astype(np.float64)
    assert u8.shape == (100, 200, 3)
    Image = pytest.importorskip("PIL.Image")
    path = os.path.join(_REF_GALLERY, "image13.png")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    ref = np.asarray(Image.open(path).convert("RGB")).astype(np.float64)
    # Sky band: pure camera geometry + sky lerp, scene-independent
    # (measured gap 0.0 u8 levels).
    assert abs(u8[:15].mean() - ref[:15].mean()) < 3.0
    # Ground band + global brightness (measured gaps 7.2 / 19.1; the
    # golden's lost ringed dielectric darkens its glass regions).
    assert abs(u8[-10:].mean() - ref[-10:].mean()) < 15.0
    assert abs(u8.mean() - ref.mean()) < 30.0
    # Antialiasing: the jittered sampler must produce intermediate
    # values across the sphere silhouette (an unjittered render of
    # this 20x20 edge window has ~2-3 distinct quantized values;
    # measured jittered: 12).
    assert len(np.unique(u8[40:60, 90:110].astype(np.uint8))) >= 6


# ---------------------------------------------------------------------------
# Earliest-gallery fixtures: the pre-material milestones. With these,
# every reproducible CPU-gallery golden has a live fixture; the
# remaining gaps are image6 (byte-wise near-duplicate of image5's
# milestone — same scene/shading, adjacent listing) and images 7/8,
# whose defining feature is DOUBLE-precision shadow-acne extinction
# (t_min=0 diffuse, archive/listing33-34: self-hits at t ~ 1e-16
# recurse the 0.5-attenuation until the image goes dark). In float32
# the self-hit root rounds to 0 and the strict t > 0 test rejects it,
# so the degeneration cannot be reproduced faithfully (nearest f32
# reproductions measured block-MAD 0.07-0.13); the acne PROPERTY is
# pinned instead by tests/test_pallas.py::test_shadow_acne_negative_example.
# ---------------------------------------------------------------------------


def test_first_gradient_matches_gallery_image1_exactly():
    """The book's first PPM: reproduced BIT-EXACTLY against the golden
    (archive/listing1/main.cc:15-23 quantization, at the golden's own
    1920x1080 resolution)."""
    Image = pytest.importorskip("PIL.Image")
    path = os.path.join(_REF_GALLERY, "image1.png")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    ref = np.asarray(Image.open(path).convert("RGB"))
    ours = np.asarray(M.first_gradient_image(ref.shape[1], ref.shape[0]))
    np.testing.assert_array_equal(ours, ref)


def test_sky_gradient_matches_gallery_image2():
    """The first ray image: pure sky lerp through the viewport
    (archive/listing9/main.cc:7-10; PRE-gamma golden)."""
    from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib

    sc = scene_lib.single_sphere_scene(pad_to=128)
    sc = sc.replace(active=np.zeros_like(np.asarray(sc.active)))
    img = np.asarray(render_image(sc, M.book_camera(192, 8, 4), KEY))
    mad = np.abs(_blocks(img) - _ref_blocks(2, gamma=False)).mean()
    assert mad < 0.004, f"sky gradient block MAD {mad:.4f}"


def test_red_sphere_matches_gallery_image3():
    """The first ray-sphere intersection: solid red on hit
    (archive/listing10/main.cc:16-21; PRE-gamma golden)."""
    img = np.asarray(
        M.render_hit_flag(M.single_sphere_sky_scene(), _cam(spp=4), KEY)
    )
    mad = np.abs(_blocks(img) - _ref_blocks(3, gamma=False)).mean()
    assert mad < 0.004, f"red sphere block MAD {mad:.4f}"


def test_single_sphere_normals_matches_gallery_image4():
    """Normals shading on the lone sphere — BEFORE the ground sphere
    (archive/listing11/main.cc:20-25; PRE-gamma golden image4; the
    with-ground variant is image5, covered above)."""
    img = np.asarray(
        M.render_normals(M.single_sphere_sky_scene(), _cam(), KEY, spp=4)
    )
    mad = np.abs(_blocks(img) - _ref_blocks(4, gamma=False)).mean()
    assert mad < 0.004, f"single-sphere normals block MAD {mad:.4f}"
