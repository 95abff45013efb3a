"""Compile-time probe for the Pallas render kernel (VERDICT r2 item 3).

Measures trace/lower vs backend-compile wall time for the bench-shaped
forward render via the AOT API, for a configurable pass count, so the
compile-time cost can be attributed (JAX tracing vs XLA/Mosaic) and
tracked per round in BASELINE.md.

Usage: python scripts/compile_probe.py [n_passes] [tile]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

    from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
    from ray_tracing_in_one_weekend_tpu.ops import pallas_render as pr
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
    )

    config = PRESETS["bench"]
    scene = cover_scene(config.seed)
    cam = make_camera_from_config(config)
    spp, max_depth = config.samples_per_pixel, config.max_depth
    budget = pr._default_budget(spp)

    n_pixels = cam.image_width * cam.image_height
    padded = -(-n_pixels // tile) * tile
    p_mat = pr.pack_scene(scene)
    pt_mat = p_mat.T
    cam_vec = jnp.asarray(pr.pack_camera(cam))
    scalars = jnp.asarray([0, 0, 0, 0], jnp.int32)
    sf, si = pr._init_state(0, padded, n_pixels, spp)

    dev = jax.devices()[0]
    print(f"probe: platform={dev.platform} n_passes={n_passes} tile={tile} "
          f"spp={spp} depth={max_depth} budget={budget}", file=sys.stderr)

    args = (p_mat, pt_mat, cam_vec, scalars, sf, si)
    statics = dict(tile=tile, spp=spp, max_depth=max_depth,
                   budget=budget, n_passes=n_passes, interpret=False)

    t0 = time.perf_counter()
    lowered = jax.jit(
        pr._multipass,
        static_argnames=("tile", "spp", "max_depth", "budget", "n_passes",
                         "interpret"),
    ).lower(*args, **statics)
    t_lower = time.perf_counter() - t0
    print(f"probe: trace+lower {t_lower:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"probe: backend compile {t_compile:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = compiled(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t_run1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    float(jnp.sum(out))
    t_run2 = time.perf_counter() - t0
    mrays = n_pixels * spp / t_run2 / 1e6
    print(f"probe: run1 {t_run1:.3f}s run2 {t_run2:.3f}s ({mrays:.1f} Mrays/s)",
          file=sys.stderr)
    print(f"{{\"n_passes\": {n_passes}, \"tile\": {tile}, "
          f"\"lower_s\": {t_lower:.1f}, \"compile_s\": {t_compile:.1f}, "
          f"\"run_s\": {t_run2:.4f}, \"mrays\": {mrays:.1f}}}")


if __name__ == "__main__":
    main()
