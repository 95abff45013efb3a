"""Render the repo's gallery artifact: the reference CPU workload
(1200x800, aperture 0.1, 500 spp, depth 50 — reference:
src/cpu/main.cc:82-99) through the Pallas kernel on TPU, plus a
jnp-backend render, and report per-pixel statistics against the
reference golden (tests/goldens/ref_cpu_cover_1200x800_500spp.png,
rendered by the reference's own cpu_ray_tracer with its fixed
mt19937(5489) seed — BASELINE.md).

The committed artifact (gallery/cover_1200x800_500spp_pallas.png) is
validated in CI by tests/test_golden_fullres.py.

Usage: python scripts/render_gallery.py [spp] [--jnp-too]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import numpy as np


def _stats(ours: np.ndarray, ref: np.ndarray, label: str) -> None:
    diff = np.abs(ours.astype(np.int32) - ref.astype(np.int32))
    print(
        f"{label}: MAD {diff.mean():.3f}  p50 {np.percentile(diff, 50):.0f}  "
        f"p99 {np.percentile(diff, 99):.0f}  p99.9 {np.percentile(diff, 99.9):.0f}  "
        f"max {diff.max()}  (8-bit levels)",
        file=sys.stderr,
    )


def main() -> None:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    jnp_too = "--jnp-too" in sys.argv

    from PIL import Image

    from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene_reference
    from ray_tracing_in_one_weekend_tpu.ops.image import to_uint8
    from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas
    from ray_tracing_in_one_weekend_tpu.utils.config import (
        PRESETS,
        make_camera_from_config,
    )

    # The reference CPU workload: 1200x800, aperture 0.1, focus 10
    # (reference: src/cpu/main.cc:82-99) on the bit-exact mt19937 scene.
    config = PRESETS["cpu"]
    scene = cover_scene_reference()
    cam = make_camera_from_config(config)
    ref = np.asarray(
        Image.open("tests/goldens/ref_cpu_cover_1200x800_500spp.png")
    )[..., :3]

    os.makedirs("gallery", exist_ok=True)
    interpret = jax.devices()[0].platform != "tpu"
    print(
        f"gallery: {cam.image_width}x{cam.image_height} spp={spp} "
        f"depth={cam.max_depth} platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )

    import jax.numpy as _jnp

    from ray_tracing_in_one_weekend_tpu.utils import checkpoint as ckpt
    from ray_tracing_in_one_weekend_tpu.utils import manifest

    # Warm accumulator path (VERDICT r4 item 2): batches accumulate on
    # device; batch 1 cold, batches 2+ run the warm single-pass
    # schedule from the carried cost map. Final image equals the
    # monolithic render up to float summation order.
    t0 = time.perf_counter()
    state = ckpt.new_state(cam)
    batch = 100
    batch_times = []
    while int(state.spp_done) < spp:
        b = min(batch, spp - int(state.spp_done))
        tb = time.perf_counter()
        state = ckpt.accumulate(state, scene, cam, 0, b,
                                backend="pallas", interpret=interpret)
        jax.block_until_ready(state.accum)
        batch_times.append(time.perf_counter() - tb)
        print(f"gallery[pallas]: samples {int(state.spp_done)}/{spp} "
              f"(+{b} in {batch_times[-1]:.2f}s, "
              f"{time.perf_counter() - t0:.0f}s total)", file=sys.stderr)
    u8 = np.asarray(to_uint8(state.image))
    t = time.perf_counter() - t0
    mrays_incl = cam.image_width * cam.image_height * spp / t / 1e6
    # Steady-state rate, same protocol as scripts/render_artifact.py:
    # skip the compile batch (1) and the warm-variant compile batch (2).
    skip = 2 if len(batch_times) > 2 else (1 if len(batch_times) > 1 else 0)
    steady_t = sum(batch_times[skip:])
    steady_rays = cam.image_width * cam.image_height * (spp - skip * batch)
    mrays = (steady_rays / steady_t / 1e6) if steady_t > 0 else mrays_incl
    print(f"gallery[pallas]: {t:.1f}s ({mrays:.1f} Mrays/s steady, "
          f"{mrays_incl:.1f} incl compile)", file=sys.stderr)
    name = f"cover_1200x800_{spp}spp_pallas.png"
    Image.fromarray(u8).save(f"gallery/{name}")
    manifest.record("gallery", name, {
        "preset": "cpu", "scene": "cover_scene_reference",
        "width": cam.image_width, "height": cam.image_height, "spp": spp,
        "max_depth": cam.max_depth, "seed": 0,
        "backend": "pallas-interpret" if interpret else "pallas-tpu",
        "render_seconds": round(t, 1),
        "mrays_per_s": round(mrays, 1),
        "mrays_per_s_incl_compile": round(mrays_incl, 1),
        "batch_seconds": [round(x, 2) for x in batch_times],
        "mean_u8": round(float(u8.mean()), 3),
    })
    _stats(u8, ref, f"pallas {spp}spp vs reference golden")

    if jnp_too:
        import jax.numpy as jnp

        from ray_tracing_in_one_weekend_tpu.ops.render import render_flat

        # Batch the jnp render over sample slices with host-side
        # accumulation: one monolithic 500-spp dispatch runs minutes on
        # the tunneled TPU and can trip the worker's RPC deadline
        # (observed worker crash); the batched form draws the SAME
        # global sample streams (render_pixels keys on global sample
        # index), so the average is bit-equivalent up to f32 summation
        # order.
        import jax as _jax

        n_pix = cam.image_width * cam.image_height
        batch = 25
        pix = jnp.arange(n_pix)
        key = _jax.random.key(0)
        t0 = time.perf_counter()
        acc = np.zeros((n_pix, 3), np.float64)
        for s0 in range(0, spp, batch):
            # Last batch may be partial when spp is not a multiple of
            # `batch`; weight each batch by its true sample count so the
            # final /spp mean stays correct for any CLI spp.
            b = min(batch, spp - s0)
            part = render_flat(
                scene, cam, pix, key, spp=b, sample_offset=s0
            )
            acc += np.asarray(part, np.float64) * b
            print(f"gallery[jnp]: samples [{s0}, {s0 + b})",
                  file=sys.stderr)
        img_j = (acc / spp).reshape(cam.image_height, cam.image_width, 3)
        u8_j = np.asarray(to_uint8(jnp.asarray(img_j, jnp.float32)))
        t = time.perf_counter() - t0
        print(f"gallery[jnp]: {t:.1f}s", file=sys.stderr)
        name_j = f"cover_1200x800_{spp}spp_jnp.png"
        Image.fromarray(u8_j).save(f"gallery/{name_j}")
        manifest.record("gallery", name_j, {
            "preset": "cpu", "scene": "cover_scene_reference",
            "width": cam.image_width, "height": cam.image_height, "spp": spp,
            "max_depth": cam.max_depth, "seed": 0, "backend": "jnp",
            "render_seconds": round(t, 1),
            "mean_u8": round(float(u8_j.mean()), 3),
        })
        _stats(u8_j, ref, f"jnp {spp}spp vs reference golden")
        _stats(u8_j, u8, f"jnp vs pallas ({spp}spp)")


if __name__ == "__main__":
    main()
