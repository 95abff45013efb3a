"""Forward-kernel performance probe: occupancy + VPU roofline (VERDICT r2 item 4).

Measures, pass by pass, the per-tile while-loop trip counts (the kernel's
_SF_ITERS diagnostics row) and live-lane counts of the budgeted
persistent-sample render, then derives:

* total tile-iterations actually executed vs the per-lane useful work
  (sum of every lane's (sample, bounce) queue) -> occupancy,
* the implied VPU element-op count of the sphere sweep (the hot cost:
  ~NUM_SWEEP_OPS [CHUNK, tile] slab ops per chunk per iteration),
* a measured VPU peak from a same-shaped FMA micro-kernel, giving an
  honest roofline: render_time vs sweep_ops / measured_peak.

Usage: python scripts/perf_probe.py [tile] [budget] [n_passes]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vpu_peak_ops(tile: int) -> float:
    """Measured element-ops/s of a chained-FMA kernel on [128, tile]
    blocks — the same shape as the render's sweep slabs.

    CAVEAT (round 5): the single serially-dependent accumulator chain
    measures FMA LATENCY, not throughput (~0.3-0.5 "Tops/s" on v5e vs
    the independent-accumulator variant in kernel_parts_probe.py), so
    this is a LOWER bound, unusable as a roofline peak. bench.py's
    published ceiling therefore uses the real kernel's own measured
    per-tile-iteration cost instead (BASELINE.md round-5 roofline
    attribution)."""
    CHAIN = 512
    REPS = 64

    def kern(x_ref, o_ref):
        def body(i, acc):
            return acc * 1.0000001 + 0.0000001

        acc = x_ref[:, :]
        acc = jax.lax.fori_loop(0, CHAIN, body, acc)
        o_ref[:, :] = acc

    @jax.jit
    def run(x):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, tile), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        for _ in range(REPS):
            x = f(x)
        return x

    x = jnp.ones((128, tile), jnp.float32)
    float(jnp.sum(run(x)))  # compile
    t0 = time.perf_counter()
    float(jnp.sum(run(x)))
    dt = time.perf_counter() - t0
    # 2 ops per FMA element.
    return 128 * tile * CHAIN * REPS * 2 / dt


def main() -> None:
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else None
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

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
    if budget is None:
        budget = pr._default_budget(spp)

    n_pixels = cam.image_width * cam.image_height
    padded = -(-n_pixels // tile) * tile
    grid = padded // tile
    p_mat = pr.pack_scene(scene)
    pt_mat = p_mat.T
    cam_vec = jnp.asarray(pr.pack_camera(cam))
    scalars = jnp.asarray([0, 0, 0, 0], jnp.int32)
    n_chunks = p_mat.shape[1] // pr.CHUNK

    core = jax.jit(
        functools.partial(pr._render_pallas_core, interpret=False),
        static_argnames=("tile", "spp", "max_depth"),
    )

    def compact(sf, si):
        sf, si, _inv = pr._compact(sf, si, tile, spp)
        return sf, si

    sf, si = pr._init_state(0, padded, n_pixels, spp)
    total_tile_iters = 0
    final_budget = spp * max_depth
    for p in range(n_passes):
        b = budget if p < n_passes - 1 else final_budget
        sf, si = core(p_mat, pt_mat, cam_vec, scalars.at[3].set(b), sf, si,
                      tile=tile, spp=spp, max_depth=max_depth)
        iters = np.asarray(sf[pr._SF_ITERS, ::tile])  # [grid]
        unfinished = np.asarray(
            (si[pr._SI_BUSY] > 0) | (si[pr._SI_STARTED] < spp)
        )
        live_tiles = int((iters > 0).sum())
        total_tile_iters += float(iters.sum())
        print(
            f"pass {p}: budget={b} live_tiles={live_tiles}/{grid} "
            f"tile_iters={iters.sum():.0f} (max {iters.max():.0f}) "
            f"unfinished_lanes={unfinished.sum()}/{padded}",
            file=sys.stderr,
        )
        if p < n_passes - 1:
            sf, si = compact(sf, si)

    # Useful work: every lane's total (sample, bounce) queue = the number
    # of body iterations a perfectly-packed scheduler would need / lane.
    # Approximated by the mean: re-render capturing per-lane depth sums is
    # not exposed; instead use total samples * mean bounce depth inferred
    # from tile iters at perfect occupancy = lower bound printed below.
    lane_iters_lower = n_pixels * spp / padded  # >= 1 iteration per sample

    # Timed full render through the public path (includes unscramble).
    def run():
        img = pr.render_pallas(scene, cam, seed=0, tile=tile,
                               n_passes=n_passes, budget=budget)
        return float(jnp.sum(img))

    run()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t_render = min(times)
    mrays = n_pixels * spp / t_render / 1e6

    # Sweep cost model: per tile-iteration, per chunk, ~NUM_SWEEP_OPS
    # [CHUNK, tile] slab ops (count from _sweep_ts + _select_hit's
    # per-chunk share; FMA pairs counted as 2).
    NUM_SWEEP_OPS = 33
    sweep_ops = total_tile_iters * n_chunks * NUM_SWEEP_OPS * pr.CHUNK * tile
    peak = _vpu_peak_ops(tile)
    t_roofline = sweep_ops / peak
    print(
        f"render: {t_render:.3f}s ({mrays:.1f} Mrays/s) tile={tile} "
        f"budget={budget} passes={n_passes}",
        file=sys.stderr,
    )
    print(
        f"roofline: tile_iters={total_tile_iters:.0f} "
        f"(ideal/lane >= {lane_iters_lower:.1f}) "
        f"sweep_ops={sweep_ops/1e12:.2f}T "
        f"vpu_peak={peak/1e12:.2f}Tops/s "
        f"t_sweep_roofline={t_roofline:.3f}s "
        f"({100*t_roofline/t_render:.0f}% of measured)",
        file=sys.stderr,
    )
    print(
        f'{{"tile": {tile}, "budget": {budget}, "n_passes": {n_passes}, '
        f'"render_s": {t_render:.4f}, "mrays": {mrays:.1f}, '
        f'"tile_iters": {total_tile_iters:.0f}, '
        f'"vpu_peak_tops": {peak/1e12:.2f}, '
        f'"roofline_s": {t_roofline:.4f}}}'
    )


if __name__ == "__main__":
    main()
