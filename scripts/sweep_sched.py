"""Sweep the forward kernel's scheduling knobs (tile, budget, n_passes)
on the bench workload and print Mrays/s per config. Pure scheduling —
the image is bit-identical for every config (see _multipass docstring).

Usage: python scripts/sweep_sched.py [configs...]
  each config is tile:budget:passes, default sweep if none given.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
    from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
    )

    config = PRESETS["bench"]
    scene = cover_scene(config.seed)
    cam = make_camera_from_config(config)
    rays = config.rays_per_frame

    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]]
    else:
        combos = [
            (2048, 30, 3),   # current default
            (2048, 20, 4),
            (2048, 15, 5),
            (2048, 12, 6),
            (1024, 30, 3),
            (1024, 15, 5),
            (4096, 30, 3),
            (2048, 25, 3),
        ]

    best = None
    for tile, budget, n_passes in combos:
        def run():
            img = render_pallas(scene, cam, seed=0, tile=tile,
                                budget=budget, n_passes=n_passes)
            return float(jnp.sum(img))

        t0 = time.perf_counter()
        s = run()
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        mrays = rays / t / 1e6
        print(
            f"tile={tile} budget={budget} passes={n_passes}: "
            f"{t:.3f}s ({mrays:.1f} Mrays/s) compile {compile_s:.1f}s "
            f"checksum {s:.1f}",
            flush=True,
        )
        if best is None or t < best[0]:
            best = (t, tile, budget, n_passes)
    t, tile, budget, n_passes = best
    print(f"best: tile={tile} budget={budget} passes={n_passes} "
          f"{t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
