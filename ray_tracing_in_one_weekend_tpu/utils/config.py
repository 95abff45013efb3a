"""Render configuration.

The reference has no config/flag system — every parameter is a
compile-time constant in `main` or `new_camera`
(reference: src/cpu/main.cc:82-99, src/gpu/camera.h:58-71,
src/gpu-old/main.cu:145-152). This dataclass exposes exactly that
parameter set (SURVEY.md §5 "Config / flag system") as a real config
with CLI flags (see utils/cli.py).

Named presets mirror the four reference variants' hard-coded values.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Image (reference: src/cpu/main.cc:82-86; src/gpu/camera.h:58-63)
    image_width: int = 1200
    aspect_ratio: float = 3.0 / 2.0
    samples_per_pixel: int = 10
    max_depth: int = 50

    # Camera (reference: src/gpu/camera.h:65-71; src/cpu/main.cc:93-99)
    vfov_degrees: float = 20.0
    lookfrom: Tuple[float, float, float] = (13.0, 2.0, 3.0)
    lookat: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    vup: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    defocus_angle_degrees: float = 0.6
    focus_dist: float = 10.0
    # CPU-tree lens parameterization (lens_radius = aperture/2,
    # reference: src/cpu/camera.h:20-26). When set, takes precedence
    # over defocus_angle_degrees (models/camera.make_camera).
    aperture: float | None = None

    # Execution (replaces thread/block geometry,
    # reference: src/gpu/main.cu:113-114; src/cpu-multi-threading/main.cc:105)
    seed: int = 0
    scene: str = "cover"  # cover | three | single
    chunk_pixels: int = 16384
    backend: str = "auto"  # auto | jnp | pallas
    mesh_shape: Tuple[int, ...] = ()  # () = single device

    @property
    def image_height(self) -> int:
        return max(1, int(self.image_width / self.aspect_ratio))

    @property
    def rays_per_frame(self) -> int:
        """Primary rays, the Mrays/s denominator (BASELINE.md protocol)."""
        return self.image_width * self.image_height * self.samples_per_pixel


# The four reference variants' hard-coded workloads (BASELINE.md table).
PRESETS = {
    # reference: src/cpu/main.cc:82-99. The CPU tree parameterizes the
    # lens by aperture 0.1 (not the GPU tree's defocus angle); passing it
    # through reproduces the CPU framing exactly
    # (equivalent defocus_angle = 2*atan(0.05/10) = 0.573 deg).
    "cpu": RenderConfig(
        image_width=1200, aspect_ratio=3.0 / 2.0, samples_per_pixel=500,
        aperture=0.1,
    ),
    # reference: src/cpu-multi-threading/main.cc:84-88
    "cpu-mt": RenderConfig(image_width=3840, aspect_ratio=16.0 / 9.0, samples_per_pixel=500),
    # reference: src/gpu/camera.h:58-71
    "gpu": RenderConfig(image_width=1920, aspect_ratio=16.0 / 9.0, samples_per_pixel=500),
    # reference: src/gpu-old/main.cu:145-152
    "gpu-old": RenderConfig(image_width=300, aspect_ratio=3.0 / 2.0, samples_per_pixel=500),
    # The driver's benchmark workload (BASELINE.json metric).
    "bench": RenderConfig(image_width=1200, aspect_ratio=3.0 / 2.0, samples_per_pixel=10),
}


def make_camera_from_config(config: RenderConfig):
    from ray_tracing_in_one_weekend_tpu.models.camera import make_camera

    return make_camera(
        image_width=config.image_width,
        aspect_ratio=config.aspect_ratio,
        samples_per_pixel=config.samples_per_pixel,
        max_depth=config.max_depth,
        vfov_degrees=config.vfov_degrees,
        lookfrom=config.lookfrom,
        lookat=config.lookat,
        vup=config.vup,
        defocus_angle_degrees=config.defocus_angle_degrees,
        focus_dist=config.focus_dist,
        aperture=config.aperture,
    )


def make_scene_from_config(config: RenderConfig):
    from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib

    if config.scene == "cover":
        return scene_lib.cover_scene(config.seed)
    if config.scene == "three":
        return scene_lib.three_sphere_scene(pad_to=128)
    if config.scene == "single":
        return scene_lib.single_sphere_scene(pad_to=128)
    raise ValueError(f"unknown scene {config.scene!r}")
