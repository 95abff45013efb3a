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

Pairing + tolerance calibration (measured block MAD at 192x108, spp
12, depth 20, CPU): normals->image5 0.0006, gray-lambertian->image9
0.0017, hemisphere-diffuse->image10 0.0017, sharp-metal-trio->image11
0.0016, fuzzed-metal-trio->image12 0.0067, glass-trio->image15 0.0079,
hollow-glass-trio->image16 0.0045. The nearest WRONG pairing measured
>= 0.05 in every case, so the thresholds below (2.5-3x measured)
discriminate cleanly. Tests skip when the reference tree is absent.
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
