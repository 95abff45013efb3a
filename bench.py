"""Benchmark: Mrays/s on the 1200x800x10spp cover scene (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing protocol matches the reference exactly: wall-clock around the
render only (scene construction, compilation and image I/O excluded),
reference: src/cpu/main.cc:107-130, src/gpu/main.cu:128-139. Mrays/s =
width * height * spp / seconds / 1e6 (primary rays, BASELINE.md).

Runs BOTH backends (the Pallas kernel and the pure-jnp path) and
reports the faster; if the kernel fails on the current platform the
jnp number still stands. vs_baseline compares against the reference
CPU implementation measured on this machine (BASELINE_MEASURED.json);
the reference publishes no numbers of its own (SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

BASELINE_MRAYS_PER_S = 0.1807  # measured reference cpu_ray_tracer (BASELINE.md)
_BASELINE_FILE = "BASELINE_MEASURED.json"


def _load_baseline() -> float:
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["cpu_reference_mrays_per_s"])
    except (OSError, KeyError, ValueError):
        return BASELINE_MRAYS_PER_S


def _time_fn(run, n_iters=3):
    """Best-of-n wall time; a scalar fetch is the completion barrier
    (block_until_ready returns early on tunneled TPU platforms)."""
    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(1, n_iters + 1):
        t0 = time.perf_counter()
        run(i)
        times.append(time.perf_counter() - t0)
    return compile_s, min(times)


def main() -> None:
    from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
    from ray_tracing_in_one_weekend_tpu.ops.render import render_image
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
    )

    config = PRESETS["bench"]  # 1200x800, 10 spp, depth 50 (BASELINE.json)
    scene = cover_scene(config.seed)
    cam = make_camera_from_config(config)

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"bench: platform={dev.platform} device={dev}", file=sys.stderr)
    print(
        f"bench: {config.image_width}x{config.image_height} "
        f"spp={config.samples_per_pixel} depth={config.max_depth} "
        f"rays={config.rays_per_frame/1e6:.1f}M",
        file=sys.stderr,
    )

    results = {}

    # --- Pallas kernel backend (compiled on TPU only) ----------------------
    if on_tpu:
        try:
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas

            def run_pallas(i):
                img = render_pallas(scene, cam, seed=i)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run_pallas)
            results["pallas"] = t
            print(
                f"bench[pallas]: compile {compile_s:.1f}s render {t:.3f}s "
                f"({config.rays_per_frame / t / 1e6:.1f} Mrays/s)",
                file=sys.stderr,
            )
        except Exception:
            print("bench[pallas]: FAILED\n" + traceback.format_exc()[-800:], file=sys.stderr)

    # --- pure-jnp backend ----------------------------------------------------
    try:
        def run_jnp(i):
            img = render_image(scene, cam, jax.random.key(i))
            return float(jnp.sum(img))

        compile_s, t = _time_fn(run_jnp)
        results["jnp"] = t
        print(
            f"bench[jnp]: compile {compile_s:.1f}s render {t:.3f}s "
            f"({config.rays_per_frame / t / 1e6:.1f} Mrays/s)",
            file=sys.stderr,
        )
    except Exception:
        print("bench[jnp]: FAILED\n" + traceback.format_exc()[-800:], file=sys.stderr)

    if not results:
        print(json.dumps({"metric": "cover_scene_1200x800x10spp_forward",
                          "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0}))
        sys.exit(1)

    backend, render_s = min(results.items(), key=lambda kv: kv[1])
    mrays = config.rays_per_frame / render_s / 1e6
    baseline = _load_baseline()
    print(f"bench: best backend = {backend}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "cover_scene_1200x800x10spp_forward",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
