"""Golden parity against the reference CPU build.

Fixtures (tests/goldens/):
* ref_cpu_cover_1200x800_500spp.png — the reference `cpu_ray_tracer`'s
  own render (g++ -O2 build of reference src/cpu, deterministic
  mt19937(5489) stream), converted from its PPM output.
* ref_scene_table.txt — the 482 accepted grid spheres
  (mat cx cz albedo_rgb fuzz) dumped by a structurally identical g++
  program, i.e. the exact scene inside that golden image.

These formalize the reference's own de-facto verification strategy
(SURVEY.md §4: committed gallery images + cross-backend parity) as an
automated harness.
"""

import os

import jax
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.ops.render import render_image
from ray_tracing_in_one_weekend_tpu.utils.reference_rng import ReferenceRandom

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def test_mt19937_replica_first_draws():
    """First doubles of std::mt19937(5489) + uniform_real_distribution
    (values cross-checked against a libstdc++ binary)."""
    rng = ReferenceRandom()
    expected = [
        0.1354770042967805,
        0.8350085899945795,
        0.96886777112423139,
        0.2210340429827049,
    ]
    for e in expected:
        assert abs(rng.random_double() - e) < 1e-15


def test_scene_table_matches_reference_binary():
    """cover_scene_reference reproduces every accepted grid sphere of
    the reference binary: material, center, albedo, fuzz."""
    sc = scene_lib.cover_scene_reference()
    center = np.asarray(sc.center)
    mat = np.asarray(sc.mat_type)
    alb = np.asarray(sc.albedo)
    fuzz = np.asarray(sc.fuzz)

    rows = [l.split() for l in open(os.path.join(GOLDEN_DIR, "ref_scene_table.txt"))]
    assert len(rows) == 482
    assert int(sc.num_active) == 1 + 482 + 3  # ground + grid + heroes

    for i, r in enumerate(rows):
        j = i + 1  # slot 0 is the ground sphere
        assert mat[j] == int(r[0])
        np.testing.assert_allclose(center[j, [0, 2]], [float(r[1]), float(r[2])], atol=1e-6)
        np.testing.assert_allclose(
            alb[j], [float(r[3]), float(r[4]), float(r[5])], atol=1e-6
        )
        np.testing.assert_allclose(fuzz[j], float(r[6]), atol=1e-6)

    # heroes after the grid (reference: src/cpu/main.cc:66-74)
    h = 1 + 482
    assert mat[h] == scene_lib.DIELECTRIC
    assert mat[h + 1] == scene_lib.LAMBERTIAN
    assert mat[h + 2] == scene_lib.METAL
    np.testing.assert_allclose(center[h], [0.0, 1.0, 0.0])


def test_cover_scene_golden_image_parity():
    """Render the reference-exact scene with the reference CPU camera
    (aperture parameterization) and compare against the reference's own
    render, downsampled to average away Monte-Carlo noise.

    The render RNG streams differ (threefry vs mt19937), so parity is in
    expectation: after 4x4 block averaging, mean absolute deviation and
    bias must sit at the noise floor. A scene/camera/material mismatch
    moves MAD by an order of magnitude (0.006 -> 0.1 when sphere
    positions are wrong), so this is a sharp test.
    """
    pil = pytest.importorskip("PIL.Image")

    sc = scene_lib.cover_scene_reference()
    cam = make_camera(
        image_width=152,
        aspect_ratio=1.5,
        samples_per_pixel=12,
        max_depth=16,
        vfov_degrees=20.0,
        lookfrom=(13.0, 2.0, 3.0),
        lookat=(0.0, 0.0, 0.0),
        aperture=0.1,
        focus_dist=10.0,
    )
    img = np.asarray(render_image(sc, cam, 0))
    ours = np.sqrt(np.maximum(img, 0.0))  # linear -> gamma-2

    golden = pil.open(
        os.path.join(GOLDEN_DIR, "ref_cpu_cover_1200x800_500spp.png")
    )
    size = (38, 25)
    a = np.asarray(
        pil.fromarray((np.clip(ours, 0, 1) * 255).astype(np.uint8)).resize(
            size, pil.BOX
        ),
        np.float32,
    ) / 255.0
    b = np.asarray(golden.resize(size, pil.BOX), np.float32) / 255.0

    d = a - b
    assert np.abs(d).mean() < 0.02, f"MAD {np.abs(d).mean():.4f}"
    assert abs(d.mean()) < 0.01, f"bias {d.mean():.4f}"
    assert np.percentile(np.abs(d), 99) < 0.08
