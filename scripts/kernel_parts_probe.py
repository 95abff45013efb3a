"""Time the forward kernel's component costs in isolation (roofline input).

Three Pallas micro-kernels, each run as a grid over the bench-sized lane
buffer with REPS iterations per tile so per-call overhead vanishes:

* fma-peak: chains of independent elementwise FMAs on [CHUNK, tile]
  slabs (8 independent accumulators, unrolled) — the achievable VPU
  element-op rate for the sweep's shapes.
* sweep: the real `_sweep_ts` chunk sweep + elementwise-min fold,
  without the gather matmul.
* gather: the real `_select_hit` one-hot matmul alone
  ([16, N] @ [N, tile] f32 on the MXU).

Prints per-tile-iteration microseconds of each part; compare against the
~16 us/tile-iteration implied by perf_probe.py to attribute the cost.

Usage: python scripts/kernel_parts_probe.py [tile] [reps]
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

from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
from ray_tracing_in_one_weekend_tpu.ops import pallas_render as pr


def _timed(fn, args):
    out = jax.block_until_ready(fn(*args))
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    scene = cover_scene(0)
    p_mat = pr.pack_scene(scene)
    pt_mat = jnp.asarray(p_mat.T)
    p_mat = jnp.asarray(p_mat)
    n = p_mat.shape[1]
    n_chunks = n // pr.CHUNK
    grid = 16

    # --- fma peak ----------------------------------------------------------
    NACC = 8
    UNROLL = 16

    def fma_kernel(x_ref, o_ref, *, reps):
        accs = [x_ref[pl.ds(i * 8, 8), :] + float(i) for i in range(NACC)]

        def body(r, accs):
            for u in range(UNROLL):
                accs = [a * 1.0000001 + 1e-7 for a in accs]
            return accs

        accs = jax.lax.fori_loop(0, reps, body, accs)
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[:, :] = acc

    @jax.jit
    def run_fma(x):
        return pl.pallas_call(
            functools.partial(fma_kernel, reps=reps),
            grid=(grid,),
            in_specs=[pl.BlockSpec((64, tile), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, tile), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, tile), jnp.float32),
        )(x)

    x = jnp.ones((64, tile), jnp.float32)
    t = _timed(run_fma, (x,))
    fma_ops = grid * reps * UNROLL * NACC * 8 * tile * 2
    peak = fma_ops / t
    print(f"fma-peak: {t*1e3:.1f}ms {peak/1e12:.2f} Tops/s "
          f"({t/ (grid*reps) *1e6:.2f} us per {NACC*8}x{tile} FMA-block-iter)")

    # --- sweep (no gather) -------------------------------------------------
    def sweep_kernel(pt_ref, o_ref, d_ref, out_ref, *, reps):
        def body(r, carry):
            o, d, acc = carry
            t_cs = pr._sweep_ts(o, d, pt_ref, n_chunks)
            t_slot = t_cs[0]
            for t_c in t_cs[1:]:
                t_slot = jnp.minimum(t_slot, t_c)
            t_best = jnp.min(t_slot, axis=0, keepdims=True)
            # Data-dependent perturbation so the loop cannot be hoisted.
            o = o + 1e-9 * t_best
            return o, d, acc + t_best

        o, d, acc = jax.lax.fori_loop(
            0, reps, body,
            (o_ref[:, :], d_ref[:, :], jnp.zeros((1, tile), jnp.float32)),
        )
        out_ref[:, :] = acc

    @jax.jit
    def run_sweep(pt, o, d):
        return pl.pallas_call(
            functools.partial(sweep_kernel, reps=reps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((n, pr.P_ROWS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, tile), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pt, o, d)

    key = jax.random.key(0)
    o = jax.random.normal(key, (3, tile), jnp.float32) * 3.0
    d = o / jnp.linalg.norm(o, axis=0, keepdims=True)
    t = _timed(run_sweep, (pt_mat, o, d))
    per_iter = t / (grid * reps)
    print(f"sweep: {t*1e3:.1f}ms {per_iter*1e6:.2f} us/tile-iter "
          f"(x{n_chunks} chunks of [{pr.CHUNK},{tile}])")

    # --- gather matmul -----------------------------------------------------
    def gather_kernel(p_ref, oh_ref, out_ref, *, reps):
        def body(r, carry):
            oh, acc = carry
            params = jax.lax.dot_general(
                p_ref[:, :], oh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oh = oh + 1e-12 * params[0:1]  # prevent hoisting
            return oh, acc + params[0:1]

        oh, acc = jax.lax.fori_loop(
            0, reps, body,
            (oh_ref[:, :], jnp.zeros((1, tile), jnp.float32)),
        )
        out_ref[:, :] = acc

    @jax.jit
    def run_gather(p, oh):
        return pl.pallas_call(
            functools.partial(gather_kernel, reps=reps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((pr.P_ROWS, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, tile), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(p, oh)

    oh = (jax.random.uniform(key, (n, tile)) < (1.0 / n)).astype(jnp.float32)
    t = _timed(run_gather, (p_mat, oh))
    per_iter = t / (grid * reps)
    mxu_flops = 2 * pr.P_ROWS * n * tile
    print(f"gather: {t*1e3:.1f}ms {per_iter*1e6:.2f} us/tile-iter "
          f"([16,{n}]@[{n},{tile}] f32 = {mxu_flops/1e6:.1f} MFLOP -> "
          f"{mxu_flops/per_iter/1e12:.1f} Tflop/s)")

    # --- K=8 skinny matmul (candidate MXU form of the sweep's dots) --------
    for prec in ("default", "highest"):
        precision = (jax.lax.Precision.HIGHEST if prec == "highest"
                     else jax.lax.Precision.DEFAULT)

        def skinny_kernel(l_ref, r_ref, out_ref, *, reps, precision=precision):
            def body(i, carry):
                r, acc = carry
                prod = jax.lax.dot_general(
                    l_ref[:, :], r,
                    (((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32,
                )  # [2n, tile]
                r = r + 1e-12 * prod[0:1]
                return r, acc + prod[0:1]

            r, acc = jax.lax.fori_loop(
                0, reps, body,
                (r_ref[:, :], jnp.zeros((1, tile), jnp.float32)),
            )
            out_ref[:, :] = acc

        @jax.jit
        def run_skinny(l, r):
            return pl.pallas_call(
                functools.partial(skinny_kernel, reps=reps),
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((2 * n, 8), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, tile), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((1, tile), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(l, r)

        l = jax.random.normal(key, (2 * n, 8), jnp.float32)
        r = jax.random.normal(key, (8, tile), jnp.float32)
        t = _timed(run_skinny, (l, r))
        per_iter = t / (grid * reps)
        print(f"skinny-{prec}: {t*1e3:.1f}ms {per_iter*1e6:.2f} us/tile-iter "
              f"([{2*n},8]@[8,{tile}] f32)")


if __name__ == "__main__":
    main()
