"""Config presets reproduce the reference variants' hard-coded values."""

import math

import numpy as np

from ray_tracing_in_one_weekend_tpu.utils.cli import build_parser, config_from_args
from ray_tracing_in_one_weekend_tpu.utils.config import (
    PRESETS,
    make_camera_from_config,
)


def test_cpu_preset_uses_reference_aperture():
    """The CPU tree's lens is aperture 0.1 (reference: src/cpu/main.cc:96,
    src/cpu/camera.h:20-26), not the GPU tree's 0.6-degree defocus angle.
    The preset must reproduce the CPU framing exactly."""
    config = PRESETS["cpu"]
    assert config.aperture == 0.1
    cam = make_camera_from_config(config)
    # lens radius = aperture/2 -> |defocus_disk_u| = 0.05
    assert np.isclose(float(np.linalg.norm(cam.defocus_disk_u)), 0.05, rtol=1e-6)
    # equivalent defocus angle = 2*atan(0.05/10) ~= 0.573 deg
    expected_deg = 2.0 * math.degrees(math.atan(0.005))
    assert np.isclose(float(cam.defocus_angle), expected_deg, rtol=1e-6)


def test_gpu_preset_uses_defocus_angle():
    """GPU tree: defocus_angle 0.6 deg (reference: src/gpu/camera.h:69)."""
    config = PRESETS["gpu"]
    assert config.aperture is None
    cam = make_camera_from_config(config)
    assert np.isclose(float(cam.defocus_angle), 0.6)


def test_cli_aperture_flag():
    args = build_parser().parse_args(["--aperture", "0.2", "--width", "100"])
    config = config_from_args(args)
    assert config.aperture == 0.2
    cam = make_camera_from_config(config)
    assert np.isclose(float(np.linalg.norm(cam.defocus_disk_u)), 0.1, rtol=1e-6)
