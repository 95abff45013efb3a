"""Render a preset workload with the Pallas kernel and commit-ready
artifact + manifest entry (VERDICT r3 items 6 and 8).

Usage: python scripts/render_artifact.py <preset> [spp] [--spp-batch N]

Renders PRESETS[<preset>] (e.g. `gpu` = 1920x1080, 500 spp, defocus
0.6 deg — reference: src/gpu/camera.h:58-71) through `render_pallas`,
writes gallery/cover_<W>x<H>_<spp>spp_<preset>.png, and records the
render in gallery/MANIFEST.json with the render-sources digest so
tests/test_golden_fullres.py can detect stale artifacts.

Large spp renders are split into sample batches accumulated in float64
on host (identical global sample streams -> the average equals the
monolithic render up to f32 summation order), keeping each device
dispatch well under the tunneled platform's RPC deadline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np


def render_preset(preset: str, spp: int | None = None, spp_batch: int = 100,
                  out_dir: str = "gallery") -> str:
    import jax.numpy as jnp
    from PIL import Image

    from ray_tracing_in_one_weekend_tpu.ops.image import to_uint8
    from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas
    from ray_tracing_in_one_weekend_tpu.utils import manifest
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
        make_scene_from_config,
    )

    config = PRESETS[preset]
    spp = config.samples_per_pixel if spp is None else spp
    scene = make_scene_from_config(config)
    cam = make_camera_from_config(config)
    interpret = jax.devices()[0].platform != "tpu"

    w, h = cam.image_width, cam.image_height
    print(f"artifact[{preset}]: {w}x{h} spp={spp} depth={cam.max_depth} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)

    t0 = time.perf_counter()
    acc = np.zeros((h, w, 3), np.float64)
    done = 0
    while done < spp:
        b = min(spp_batch, spp - done)
        part = render_pallas(scene, cam, seed=config.seed, spp=b,
                             sample_offset=done, interpret=interpret)
        acc += np.asarray(part, np.float64) * b
        done += b
        print(f"artifact[{preset}]: samples {done}/{spp} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
    img = jnp.asarray(acc / spp, jnp.float32)
    u8 = np.asarray(to_uint8(img))
    t = time.perf_counter() - t0
    mrays = w * h * spp / t / 1e6

    os.makedirs(out_dir, exist_ok=True)
    name = f"cover_{w}x{h}_{spp}spp_{preset}.png"
    Image.fromarray(u8).save(os.path.join(out_dir, name))
    manifest.record(out_dir, name, {
        "preset": preset,
        "width": w, "height": h, "spp": spp,
        "max_depth": cam.max_depth,
        "seed": config.seed,
        "backend": "pallas-interpret" if interpret else "pallas-tpu",
        "render_seconds": round(t, 1),
        "mrays_per_s": round(mrays, 1),
        "mean_u8": round(float(u8.mean()), 3),
    })
    print(f"artifact[{preset}]: {name} in {t:.0f}s ({mrays:.1f} Mrays/s incl "
          f"compile), mean {u8.mean():.1f}", file=sys.stderr)
    return name


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    preset = args[0] if args else "gpu"
    spp = int(args[1]) if len(args) > 1 else None
    spp_batch = 100
    if "--spp-batch" in sys.argv:
        spp_batch = int(sys.argv[sys.argv.index("--spp-batch") + 1])
    render_preset(preset, spp, spp_batch)


if __name__ == "__main__":
    main()
