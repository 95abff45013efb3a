"""Benchmark: Mrays/s on the 1200x800x10spp cover scene (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing protocol matches the reference exactly: wall-clock around the
render only (scene construction, compilation and image I/O excluded),
reference: src/cpu/main.cc:107-130, src/gpu/main.cu:128-139. Mrays/s =
width * height * spp / seconds / 1e6 (primary rays, BASELINE.md).

vs_baseline compares against the reference CPU implementation measured
on this machine (BASELINE.md "CPU reference render time"); the reference
publishes no numbers of its own (SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Reference cpu_ray_tracer measured on this machine (g++ -O2, one
# thread): see BASELINE.md for the run log. Mrays/s = 1200*800*500 /
# seconds / 1e6. Updated by scripts/measure_baseline.sh.
BASELINE_MRAYS_PER_S = None  # filled after the reference run completes
_BASELINE_FILE = "BASELINE_MEASURED.json"


def _load_baseline() -> float | None:
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["cpu_reference_mrays_per_s"])
    except (OSError, KeyError, ValueError):
        return BASELINE_MRAYS_PER_S


def main() -> None:
    from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
    )
    from ray_tracing_in_one_weekend_tpu.ops.render import render_image

    config = PRESETS["bench"]  # 1200x800, 10 spp, depth 50 (BASELINE.json)
    scene = cover_scene(config.seed)
    cam = make_camera_from_config(config)
    key = jax.random.key(config.seed)

    dev = jax.devices()[0]
    print(f"bench: platform={dev.platform} device={dev}", file=sys.stderr)
    print(
        f"bench: {config.image_width}x{config.image_height} "
        f"spp={config.samples_per_pixel} depth={config.max_depth} "
        f"rays={config.rays_per_frame/1e6:.1f}M",
        file=sys.stderr,
    )

    # NOTE: on the tunneled TPU platform, block_until_ready returns
    # before remote execution finishes; reducing to a scalar and
    # fetching it is the only reliable completion barrier. The reduce
    # adds O(pixels) work — negligible against the render.
    def run(key):
        img = render_image(scene, cam, key)
        return float(jnp.sum(img))

    # Warmup = compile (first compile is slow; excluded like the
    # reference excludes scene build).
    t0 = time.perf_counter()
    run(key)
    print(f"bench: compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(jax.random.key(i))
        times.append(time.perf_counter() - t0)
    render_s = min(times)
    print(f"bench: render times {[f'{t:.3f}' for t in times]}", file=sys.stderr)

    mrays = config.rays_per_frame / render_s / 1e6
    baseline = _load_baseline()
    vs = (mrays / baseline) if baseline else None

    print(
        json.dumps(
            {
                "metric": "cover_scene_1200x800x10spp_forward",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
