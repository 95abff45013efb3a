"""Benchmark: Mrays/s on the 1200x800x10spp cover scene (BASELINE.md).

Prints ONE JSON line with the headline forward number plus an `extra`
dict carrying the full benchmark family (BASELINE.md target metrics):

* forward Mrays/s for both backends (Pallas kernel, pure jnp)
* forward+backward Mrays/s through the Pallas backward kernel
  (ops/pallas_grad.py) — the north-star differentiable fast path
* the sharded-mesh forward number (render_pallas_distributed over every
  local device; on a 1-chip host this measures sharding overhead)
* compile seconds per entry, and a compiled-vs-interpret identity check
  on a small tile (the kernel's claim of mode equivalence, enforced)

Timing protocol matches the reference exactly: wall-clock around the
render only (scene construction, compilation and image I/O excluded),
reference: src/cpu/main.cc:107-130, src/gpu/main.cu:128-139. Mrays/s =
width * height * spp / seconds / 1e6 (primary rays, BASELINE.md).
Forward+backward uses the same ray count over the fwd+bwd wall time, so
its Mrays/s is directly comparable to the forward row (a value of 1/3x
forward means bwd costs ~2x fwd).

vs_baseline compares against the reference CPU implementation measured
on this machine (BASELINE_MEASURED.json); the reference publishes no
numbers of its own (SURVEY.md §6).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

# Persistent compilation cache: makes re-runs (and driver runs after a
# dev run) skip XLA/Mosaic compile entirely. Harmless on first run.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_MRAYS_PER_S = 0.1807  # measured reference cpu_ray_tracer (BASELINE.md)
_BASELINE_FILE = "BASELINE_MEASURED.json"


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


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
    for _ in range(n_iters):
        t0 = time.perf_counter()
        run(0)
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
    rays = config.rays_per_frame

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    _log(f"bench: platform={dev.platform} device={dev}")
    # Tiny warm-up dispatch + fetch: exercises the device RPC path
    # before the first multi-second program (the tunneled TPU plugin
    # has been observed to wedge a fresh process's first large
    # dispatch; a failed warm-up fails fast instead of hanging the
    # whole bench).
    _log(f"bench: warmup {float(jnp.sum(jnp.ones((8, 128)))):.0f}")
    _log(
        f"bench: {config.image_width}x{config.image_height} "
        f"spp={config.samples_per_pixel} depth={config.max_depth} "
        f"rays={rays/1e6:.1f}M"
    )

    results = {}
    extra = {}

    # --- Pallas kernel backend (compiled on TPU only) ----------------------
    if on_tpu:
        try:
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas

            def run_pallas(i):
                img = render_pallas(scene, cam, seed=i)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run_pallas)
            results["pallas"] = t
            extra["pallas_fwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_fwd_compile_s"] = round(compile_s, 1)
            _log(
                f"bench[pallas]: compile {compile_s:.1f}s render {t:.3f}s "
                f"({rays / t / 1e6:.1f} Mrays/s)"
            )
        except Exception:
            _log("bench[pallas]: FAILED\n" + traceback.format_exc()[-800:])

        # --- forward+backward through the Pallas backward kernel ----------
        try:
            from ray_tracing_in_one_weekend_tpu.ops.pallas_grad import (
                DIFF_FIELDS,
                render_grads_pallas,
            )

            params = {k: getattr(scene, k) for k in DIFF_FIELDS}
            target = jnp.zeros(
                (cam.image_height, cam.image_width, 3), jnp.float32
            )

            # One jitted graph for the whole step: eager dispatch of the
            # surrounding glue costs seconds per call over the tunneled
            # TPU platform.
            grad_fn = jax.jit(
                lambda p: render_grads_pallas(p, scene, cam, target, seed=0)
            )

            def run_grads(i):
                loss, grads = grad_fn(params)
                # Completion barrier on both loss and one grad leaf.
                return float(loss) + float(jnp.sum(grads["radius"]))

            compile_s, t = _time_fn(run_grads)
            extra["pallas_fwd_bwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_fwd_bwd_compile_s"] = round(compile_s, 1)
            extra["pallas_fwd_bwd_s"] = round(t, 3)
            _log(
                f"bench[pallas fwd+bwd]: compile {compile_s:.1f}s "
                f"step {t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)"
            )
        except Exception:
            _log("bench[pallas fwd+bwd]: FAILED\n" + traceback.format_exc()[-800:])

        # --- sharded-mesh forward (all local devices) ----------------------
        try:
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
                render_pallas_distributed,
            )
            from ray_tracing_in_one_weekend_tpu.parallel.dist import make_mesh

            mesh = make_mesh()
            n_dev = len(jax.devices())

            def run_dist(i):
                img = render_pallas_distributed(scene, cam, seed=i, mesh=mesh)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run_dist)
            extra["pallas_mesh_devices"] = n_dev
            extra["pallas_mesh_fwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_mesh_compile_s"] = round(compile_s, 1)
            _log(
                f"bench[pallas mesh x{n_dev}]: compile {compile_s:.1f}s "
                f"render {t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)"
            )
        except Exception:
            _log("bench[pallas mesh]: FAILED\n" + traceback.format_exc()[-800:])

        # --- compiled-vs-interpret identity (mode-equivalence, enforced) ---
        try:
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas

            small = make_camera_small()
            img_c = jnp.asarray(render_pallas(scene, small, seed=0, tile=256))
            img_i = jnp.asarray(
                render_pallas(scene, small, seed=0, tile=256, interpret=True)
            )
            import numpy as np

            identical = bool(np.array_equal(np.asarray(img_c), np.asarray(img_i)))
            max_diff = float(jnp.max(jnp.abs(img_c - img_i)))
            extra["compiled_vs_interpret_bitwise"] = identical
            extra["compiled_vs_interpret_max_diff"] = max_diff
            _log(
                f"bench[mode check]: compiled-vs-interpret "
                f"{'BIT-IDENTICAL' if identical else f'max diff {max_diff:.3g}'}"
            )
        except Exception:
            _log("bench[mode check]: FAILED\n" + traceback.format_exc()[-800:])

    # --- pure-jnp backend ----------------------------------------------------
    try:
        def run_jnp(i):
            img = render_image(scene, cam, jax.random.key(i))
            return float(jnp.sum(img))

        compile_s, t = _time_fn(run_jnp)
        results["jnp"] = t
        extra["jnp_fwd_mrays"] = round(rays / t / 1e6, 2)
        extra["jnp_fwd_compile_s"] = round(compile_s, 1)
        _log(
            f"bench[jnp]: compile {compile_s:.1f}s render {t:.3f}s "
            f"({rays / t / 1e6:.1f} Mrays/s)"
        )
    except Exception:
        _log("bench[jnp]: FAILED\n" + traceback.format_exc()[-800:])

    if not results:
        print(json.dumps({"metric": "cover_scene_1200x800x10spp_forward",
                          "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0}))
        sys.exit(1)

    backend, render_s = min(results.items(), key=lambda kv: kv[1])
    mrays = rays / render_s / 1e6
    baseline = _load_baseline()
    _log(f"bench: best backend = {backend}")
    print(
        json.dumps(
            {
                "metric": "cover_scene_1200x800x10spp_forward",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / baseline, 3),
                "extra": extra,
            }
        )
    )


def make_camera_small():
    """64x32 @ 4spp probe camera for the mode-equivalence check."""
    from ray_tracing_in_one_weekend_tpu.models.camera import make_camera

    return make_camera(
        image_width=64,
        aspect_ratio=2.0,
        samples_per_pixel=4,
        max_depth=8,
    )


if __name__ == "__main__":
    main()
