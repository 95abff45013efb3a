"""Differentiable fast path: scene-parameter gradients at Pallas speed.

The reference renderer has no gradients at all; BASELINE.json's
north-star asks for a differentiable TPU formulation of the reference's
iterative integrator (reference: src/gpu/camera.h:112-138) whose
forward AND backward both run as compiled TPU kernels, not through the
~20x-slower pure-jnp autodiff path.

Design — `jax.custom_vjp` around the scene parameter matrix:

* **primal / fwd** — exactly `ops/pallas_render._multipass`, the
  budgeted persistent-sample forward kernel. Rendering without
  gradients costs nothing extra, and the primal VALUE of the
  differentiable entry is bit-identical to `render_pallas`.
* **bwd** — one new Pallas kernel (`_bwd_kernel`) that REPLAYS every
  (pixel, sample) path and differentiates it:

  - Phase A (replay): lanes are pixels running a PERSISTENT queue of
    `group` samples each (grid = (ceil(spp/group), pixel_blocks)) —
    the same occupancy model as the forward kernel's persistent-sample
    loop: a lane that retires a sample immediately regenerates its
    next one, so a tile pays max-of-sums instead of sum-of-maxes over
    the bounce-depth distribution (see _bwd_kernel). Because every
    random draw is a pure function of the GLOBAL
    (pixel, sample, bounce, draw) tuple (ops/pallas_render module
    docstring), re-running the same shared building blocks
    (`_sweep_ts`, `_select_hit`, `_scatter_block`,
    `_camera_ray_block`) regenerates the forward pass's paths
    bit-identically — the recompute-instead-of-store answer to the
    fact that storing per-bounce residuals for 1e9 samples would need
    ~terabytes. Per iteration, the PRE-bounce lane state
    (o, d, attenuation) plus the event metadata (winning sphere,
    depth, sample index, regen flag) are appended to a VMEM scratch
    trajectory buffer.
  - Phase B (backward sweep): walk the trajectory in reverse carrying
    adjoints (o_bar, d_bar, att_bar) [3,T]. Each step re-expresses the
    bounce as a pure function F(o, d, att, gathered_params) ->
    (o', d', att', radiance_term) — the same arithmetic as the forward
    hot loop, with the DISCRETE decisions (hit selection, material
    branch, reflect/refract, early retirement) frozen to the replayed
    trajectory, i.e. the standard Monte-Carlo-discrete gradient
    semantics of the jnp path (ops/materials.py docstring) — and pulls
    the adjoints back with `jax.vjp` ON THE KERNEL'S OWN TRACE (Pallas
    kernels are traced JAX programs, so reverse-mode works inside
    them). Parameter cotangents are scattered into the [16, N] scene
    gradient with a one-hot MXU matmul — the transpose of the forward
    gather — and accumulated across grid steps in the revisited output
    block.

Gradients flow to every continuous scene parameter (center, radius,
albedo, fuzz, ior) through the packed matrix rows (including the fused
-2c / |c|^2 - r^2 rows, whose chain rule back to center/radius is
handled by autodiff through `pack_scene`). The camera is treated as
non-differentiable (zero cotangent), matching the jnp path's
`parallel/dist.py DIFF_FIELDS` contract.

Cost: fwd = the unchanged fast kernel (it additionally emits its
per-lane cost map, which rides in the vjp residuals); bwd = one replay
+ one adjoint sweep over lanes WARM-STARTED by that cost map — the
driver packs cost-similar pixels into the same tiles (_cost_perm) and
the kernel takes per-lane pixel ids as data, so every tile's
max-of-sums queue collapses toward its mean. Measured v5e, bench
preset (1200x800x10spp depth 50): fwd 0.303s; fwd+bwd step 0.774s
=> bwd alone ~0.47s = 1.55x forward — under the one-replay +
one-adjoint design sketch's ~3x (round 3's one-sample-per-lane
version was 8x; round 4's persistent queues alone were 2.6x).
Tracked by bench.py's forward+backward row.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ray_tracing_in_one_weekend_tpu.models.camera import Camera
from ray_tracing_in_one_weekend_tpu.models.scene import Scene
from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
    CHUNK,
    DEFAULT_PASSES,
    DEFAULT_TILE,
    P_ROWS,
    T_MIN_EPS,
    T_MISS,
    _AB,
    _AR,
    _CSQR2,
    _CX,
    _CY,
    _CZ,
    _IOR,
    _M2CX,
    _M2CY,
    _M2CZ,
    _MAT,
    _R,
    _GOLDEN,
    _GOLDEN2,
    _camera_ray_block,
    _default_budget,
    _dot3,
    _init_state,
    _multipass,
    _pcg,
    _scatter_block,
    _select_hit,
    _sweep_ts,
    _unpack_cam,
    pack_camera,
    pack_scene,
)

# Trajectory scratch layout: one 16-sublane slab per PERSISTENT-LOOP
# ITERATION (not per bounce depth — lanes run a persistent multi-sample
# queue exactly like the forward kernel, so one iteration advances every
# busy lane's current sample by one bounce).
# Rows 0:3 = ray origin, 3:6 = unit direction, 6:9 = attenuation (all
# PRE-bounce), row 9 = event code as f32: -1 lane idle, 0 miss->sky,
# -2 terminal hit (absorbed / depth exhausted), i+1 = continued off
# sphere i. Row 10 = pre-bounce bounce depth of the lane's live sample,
# row 11 = regen flag (lane started its NEXT sample right after this
# bounce), row 12 = local sample index of the live sample. Rows 13:16
# pad to the sublane tile; rows 16:32 are the winning sphere's gathered
# parameter column (the forward gather's [16, T] output), stored so the
# reverse sweep skips the [16,N]x[N,T] re-gather matmul per step.
_TRAJ_ROWS = 32
_DEFAULT_BWD_TILE = 512

# VMEM budget for the trajectory scratch buffer, which bounds how many
# samples a lane can run per kernel instance (group) at worst-case
# depth. 48MB leaves room for the scene blocks, lane state and the
# adjoint sweep's temporaries inside the 100MB compiler cap.
_TRAJ_VMEM_BYTES = 48 * 1024 * 1024


def _bwd_group(spp: int, max_depth: int, tile: int) -> int:
    """Samples per lane per backward-kernel instance: as many as the
    worst-case trajectory (group * max_depth iterations) fits in the
    scratch budget. Larger groups amortize the tile's deep-path tail
    over more samples (the same occupancy argument as the forward
    kernel's persistent-sample loop)."""
    per_sample = max_depth * _TRAJ_ROWS * tile * 4
    return int(max(1, min(spp, _TRAJ_VMEM_BYTES // per_sample)))


def _bwd_kernel(
    scalars_ref,  # SMEM [4] i32: seed, pixel_offset, sample_offset, n_pixels
    cam_ref,  # SMEM [CAM_LEN] f32
    p_ref,  # VMEM [16, N]
    pt_ref,  # VMEM [N, 16]
    pix_ref,  # VMEM [1, TILE] i32 per-lane GLOBAL pixel ids (any order)
    g_ref,  # VMEM [3, TILE] per-lane radiance cotangent (image cotangent / spp)
    grads_ref,  # VMEM [16, N] out — parameter-matrix cotangent, accumulated
    traj_ref,  # VMEM scratch [group * max_depth * 32, TILE] f32
    *,
    tile: int,
    n_spheres: int,
    max_depth: int,
    spp: int,
    group: int,
):
    """Replay + adjoint sweep with the forward kernel's occupancy model.

    The round-3 version ran ONE sample per lane on a (spp, blocks)
    grid: every grid step paid the tile's MAX single-sample bounce
    depth (~30) against a ~2.9 mean — ~8x forward cost overall. This
    version gives each lane a persistent queue of `group` samples
    (grid = (ceil(spp/group), blocks)): a lane that retires a sample
    immediately starts its next one, so a tile pays max-of-sums
    (~group * mean + tail) instead of sum-of-maxes — the exact
    rebalancing the forward kernel's persistent-sample loop does
    (ops/pallas_render.py). Phase A records one 32-row slab per
    iteration (state + event metadata + the gathered parameter
    column); Phase B walks the slabs in reverse, resetting a lane's
    adjoints whenever it crosses the sample boundary it regenerated at
    (the fresh camera ray is parameter-independent, so the carried
    adjoints of the overwritten state are dropped, exactly transposing
    the forward where(regen, camera, state) overwrite).
    """
    camc = _unpack_cam(cam_ref)
    width = camc[-1]
    n_chunks = n_spheres // CHUNK
    t_min = cam_ref[20]  # shadow-acne epsilon, same SMEM slot as forward
    grp = pl.program_id(0)  # sample-group index
    j = pl.program_id(1)  # pixel block

    # Per-lane GLOBAL pixel ids come from an input row (not from the
    # block index): the driver may permute lanes into cost-homogeneous
    # tiles using the forward pass's work map (warm-start replay — the
    # same occupancy lever as ops/pallas_render.py's work_hint), so a
    # lane's pixel is data. Out-of-image pad lanes carry ids beyond the
    # live bound and idle.
    pix = pix_ref[:, :]  # [1, T]
    valid = pix < scalars_ref[3]
    px = (pix % width).astype(jnp.float32)
    py = (pix // width).astype(jnp.float32)

    # Identical stream derivation to the forward kernel: h0 from the
    # global pixel id, the 64-bit (lo, hi) stream from the GLOBAL sample
    # index (reference: src/gpu/camera.h:186-187's curand streams).
    h0 = _pcg(pix.astype(jnp.uint32) ^ _pcg(scalars_ref[0].astype(jnp.uint32)))

    base_local = grp * group  # this group's first local sample index
    # Samples each lane must run in this instance (partial last group).
    todo = jnp.minimum(group, spp - base_local)

    def camera_ray(s_local):
        """Camera ray + stream for LOCAL (within-call) sample index
        `s_local` [1,T]; the global stream key adds the call's
        sample_offset, exactly as the forward kernel does."""
        return _camera_ray_block(
            camc, h0, px, py, base_local + s_local + scalars_ref[2], tile
        )

    # Integer iota + cast: Mosaic's tpu.iota only produces integers, so
    # a float32 broadcasted_iota fails TPU lowering (works interpreted).
    iota_n1 = jax.lax.broadcasted_iota(jnp.int32, (2, n_spheres), 1).astype(
        jnp.float32
    )
    idx_mass_rows = jnp.concatenate(
        [iota_n1[0:1], jnp.ones((1, n_spheres), jnp.float32)], axis=0
    )  # [2, N]: sphere index row + tie-mass row

    max_iters = group * max_depth  # hard bound: traj slab count

    # ---- Phase A: persistent-sample replay, recording the trajectory ----
    # Hoisted first start (mirrors the forward kernel): every valid lane
    # with samples to run starts its first sample now.
    started0 = jnp.zeros((1, tile), jnp.int32)
    can0 = valid & (started0 < todo)
    o0, d0, lo0, hi0 = camera_ray(started0)
    started0 = started0 + can0.astype(jnp.int32)
    zeros_t = jnp.zeros((1, tile), jnp.int32)
    state = (
        jnp.int32(0),
        started0,
        jnp.where(can0, lo0, jnp.uint32(0)),
        jnp.where(can0, hi0, jnp.uint32(0)),
        zeros_t,  # depth
        can0.astype(jnp.float32),  # busy
        jnp.where(can0, o0, 0.0),
        jnp.where(can0, d0, 0.0),
        jnp.ones((3, tile), jnp.float32),  # attenuation
    )

    def cond(state):
        k, busy_f = state[0], state[5]
        return (k < max_iters) & (jnp.max(busy_f) > 0.0)

    def body(state):
        k, started, lo, hi, depth, busy_f, o, d, att = state
        busy = busy_f > 0.0
        stream = (lo, hi)

        t_cs = _sweep_ts(o, d, pt_ref, n_chunks, t_min)
        t_best, params, onehot = _select_hit(p_ref, t_cs)
        hit = t_best < (T_MISS * 0.5)

        # Winning sphere index via the same one-hot, tie-normalized.
        g2 = jax.lax.dot_general(
            idx_mass_rows,
            onehot.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [2, T]
        idx_f = g2[0:1] / jnp.maximum(g2[1:2], 1.0)

        # Geometry + scatter: the forward kernel's expressions verbatim.
        center_h = params[_CX : _CZ + 1]
        t_safe = jnp.where(hit, t_best, 1.0)
        p = o + t_safe * d
        r_signed = params[_R : _R + 1]
        inv_r = 1.0 / jnp.where(jnp.abs(r_signed) > 1e-8, r_signed, 1.0)
        outward = (p - center_h) * inv_r
        front_face = _dot3(d, outward) < 0.0
        n_vec = jnp.where(front_face, outward, -outward)

        ctr = jnp.uint32(8) + depth.astype(jnp.uint32) * jnp.uint32(16)
        new_dir, mat_atten, ok = _scatter_block(
            d, n_vec, front_face, params, stream, ctr
        )

        depth1 = depth + 1
        cont = busy & hit & ok & (depth1 < max_depth)
        miss = busy & ~hit
        retired = busy & ~cont
        regen = retired & (started < todo)
        code = jnp.where(
            busy,
            jnp.where(miss, 0.0, jnp.where(cont, idx_f + 1.0, -2.0)),
            -1.0,
        )

        # Record PRE-bounce state + event metadata as one 16-row slab.
        slab = jnp.concatenate(
            [
                o, d, att, code,
                depth.astype(jnp.float32),
                regen.astype(jnp.float32),
                (started - 1).astype(jnp.float32),  # live sample local idx
                jnp.zeros((16 - 13, tile), jnp.float32),
                params,  # gathered [16, T] parameter columns (rows 16:32)
            ],
            axis=0,
        )
        traj_ref[pl.ds(k * _TRAJ_ROWS, _TRAJ_ROWS), :] = slab

        # Advance the continuing rays.
        att = jnp.where(cont, att * mat_atten, att)
        o = jnp.where(cont, p, o)
        d = jnp.where(cont, new_dir, d)
        # Retired lanes with samples left start their next sample NOW.
        o2, d2, lo2, hi2 = camera_ray(started)
        started = started + regen.astype(jnp.int32)
        lo = jnp.where(regen, lo2, lo)
        hi = jnp.where(regen, hi2, hi)
        depth = jnp.where(regen, 0, depth1)
        att = jnp.where(regen, 1.0, att)
        o = jnp.where(regen, o2, o)
        d = jnp.where(regen, d2, d)
        busy = cont | regen
        return (k + 1, started, lo, hi, depth,
                busy.astype(jnp.float32), o, d, att)

    kmax = jax.lax.while_loop(cond, body, state)[0]

    # ---- Phase B: reverse adjoint sweep ----------------------------------
    g_lane = jnp.where(valid, g_ref[:, :], 0.0)  # [3, T]
    iota_nt = jax.lax.broadcasted_iota(jnp.int32, (n_spheres, tile), 0).astype(
        jnp.float32
    )
    # Safe parameter column for idle/miss lanes (gathered params are 0
    # there): radius 1 and ior 1 keep every reciprocal finite so no NaN
    # can leak into live lanes' adjoints through where-branches. Built
    # with traced iota+where (no scatter, no captured constants) so the
    # construction is legal both compiled (Mosaic) and interpreted.
    prow = jax.lax.broadcasted_iota(jnp.int32, (P_ROWS, 1), 0)
    safe_col = ((prow == _R) | (prow == _IOR)).astype(jnp.float32)

    def back_body(jj, carry):
        obar, dbar, attbar, gacc = carry
        k = kmax - 1 - jj
        slab = traj_ref[pl.ds(k * _TRAJ_ROWS, _TRAJ_ROWS), :]
        o = slab[0:3]
        d = slab[3:6]
        att = slab[6:9]
        code = slab[9:10]
        # Small-int metadata rides in f32 slab rows (exact below 2^24);
        # Mosaic has no direct f32->u32 cast, so route through i32.
        depth = slab[10:11].astype(jnp.int32)
        regen = slab[11:12] > 0.5
        samp = slab[12:13].astype(jnp.int32)  # local sample idx
        cont = code > 0.5
        miss = jnp.abs(code) < 0.5

        # Undo the forward regen overwrite FIRST: lanes that started
        # their next sample right after this bounce carried adjoints of
        # a fresh camera ray — parameter-independent, so they are
        # dropped before pulling back through this bounce.
        obar = jnp.where(regen, 0.0, obar)
        dbar = jnp.where(regen, 0.0, dbar)
        attbar = jnp.where(regen, 0.0, attbar)

        # Per-slab RNG stream: this iteration's live sample differs per
        # lane, so re-derive (lo, hi) exactly as _camera_ray_block does.
        s_u = (base_local + samp + scalars_ref[2]).astype(jnp.uint32)
        stream = (_pcg(h0 ^ (s_u * _GOLDEN)), _pcg((h0 + s_u) * _GOLDEN2))

        onehot = (iota_nt == (code - 1.0)).astype(jnp.float32)  # [N, T]
        # Winning sphere's parameter column, stored by Phase A (the
        # forward gather's exact output — tie-normalized, unlike a
        # fresh p @ onehot, which matters only on measure-zero ties).
        pcols = slab[16:32]

        ctr = jnp.uint32(8) + depth.astype(jnp.uint32) * jnp.uint32(16)

        def F(o, d, att, pcols):
            """One bounce as a pure function of the continuous inputs,
            discrete decisions frozen to the replayed trajectory. The
            arithmetic below repeats the forward hot loop exactly, so
            the primal values (and therefore every frozen comparison)
            match the forward pass bit for bit."""
            pc = jnp.where(cont, pcols, safe_col)
            o_dot_d = _dot3(o, d)
            o_sq = _dot3(o, o)
            d_dot_c = (
                pc[_CX : _CX + 1] * d[0:1]
                + pc[_CY : _CY + 1] * d[1:2]
                + pc[_CZ : _CZ + 1] * d[2:3]
            )
            cc_part = (
                pc[_CSQR2 : _CSQR2 + 1]
                + pc[_M2CX : _M2CX + 1] * o[0:1]
                + pc[_M2CY : _M2CY + 1] * o[1:2]
                + pc[_M2CZ : _M2CZ + 1] * o[2:3]
            )
            half_b = o_dot_d - d_dot_c
            cc = o_sq + cc_part
            disc = half_b * half_b - cc
            # Dead lanes see disc=1 (double-where); live lanes floor the
            # sqrt argument at 1e-12 so a grazing hit (disc -> 0+, or
            # even disc < 0 here when Mosaic's FMA contraction differs
            # between the Phase-A replay and this recomputation) keeps
            # the sqrt pullback g / (2 sqrt(disc)) <= 5e5 g instead of
            # inf. Without the floor one grazing lane's inf poisons
            # every geometry-row gradient via the gacc matmul — observed
            # compiled on v5e (finite interpreted), the exact hazard
            # SURVEY.md §7 (a) flags. Primal error of the floor:
            # sqrt_d off by <= 1e-6 on those lanes only.
            disc = jnp.where(cont, disc, 1.0)
            sqrt_d = jnp.sqrt(jnp.maximum(disc, 1e-12))
            root_near = -half_b - sqrt_d
            root_far = -half_b + sqrt_d
            t = jnp.where(root_near > t_min, root_near, root_far)
            t_safe = jnp.where(cont, t, 1.0)
            p = o + t_safe * d

            center_h = pc[_CX : _CZ + 1]
            r_signed = pc[_R : _R + 1]
            inv_r = 1.0 / jnp.where(jnp.abs(r_signed) > 1e-8, r_signed, 1.0)
            outward = (p - center_h) * inv_r
            front_face = _dot3(d, outward) < 0.0
            n_vec = jnp.where(front_face, outward, -outward)

            new_dir, mat_atten, _ok = _scatter_block(
                d, n_vec, front_face, pc, stream, ctr
            )

            o2 = jnp.where(cont, p, o)
            d2 = jnp.where(cont, new_dir, d)
            att2 = jnp.where(cont, att * mat_atten, att)

            # Miss -> sky termination (reference: src/gpu/camera.h:118-124).
            sky_a = 0.5 * (d[1:2] + 1.0)
            sky = jnp.concatenate(
                [
                    (1.0 - sky_a) + sky_a * 0.5,
                    (1.0 - sky_a) + sky_a * 0.7,
                    (1.0 - sky_a) + sky_a * 1.0,
                ],
                axis=0,
            )
            radd = jnp.where(miss, att * sky, 0.0)
            return o2, d2, att2, radd

        _, pullback = jax.vjp(F, o, d, att, pcols)
        obar, dbar, attbar, pbar = pullback((obar, dbar, attbar, g_lane))

        # Per-step adjoint clipping. The path-tracer's per-bounce
        # Jacobian is unbounded at ill-conditioned events — a
        # near-degenerate lambertian direction (|n + u| just above the
        # 1e-16 fallback threshold) has a ~1e8 normalize Jacobian, and a
        # few such bounces chained multiply past float32 range. On the
        # 960k-pixel cover scene a handful of lanes sit close enough to
        # the cliff that Mosaic's fused-multiply-add contraction (vs the
        # interpreter's strict order) tips them from ~1e38 to inf, and
        # one inf lane NaN-poisons EVERY sphere's geometry gradient
        # through the zero-entries of the gacc one-hot matmul (0*inf).
        # Clipping per step bounds the chain far below overflow while
        # leaving well-conditioned gradients (O(1) scale, the FD-tested
        # regime) untouched — the standard outlier treatment for
        # Monte-Carlo gradient estimators.
        _CLIP = 1e6
        obar = jnp.clip(obar, -_CLIP, _CLIP)
        dbar = jnp.clip(dbar, -_CLIP, _CLIP)
        attbar = jnp.clip(attbar, -_CLIP, _CLIP)
        pbar = jnp.clip(pbar, -_CLIP, _CLIP)

        # Transposed gather: scatter this bounce's parameter cotangent
        # into the per-sphere gradient matrix on the MXU.
        gacc = gacc + jax.lax.dot_general(
            pbar,
            onehot,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, N]
        return obar, dbar, attbar, gacc

    zeros3 = jnp.zeros((3, tile), jnp.float32)
    gacc0 = jnp.zeros((P_ROWS, n_spheres), jnp.float32)
    _, _, _, gacc = jax.lax.fori_loop(
        0, kmax, back_body, (zeros3, zeros3, zeros3, gacc0)
    )

    first = (grp == 0) & (j == 0)

    @pl.when(first)
    def _():
        grads_ref[:, :] = gacc

    @pl.when(jnp.logical_not(first))
    def _():
        grads_ref[:, :] = grads_ref[:, :] + gacc


def _pallas_bwd(
    p_mat, pt_mat, cam_vec, scalars, pix_lanes, g_lanes, *, tile, spp,
    max_depth, interpret, group=None,
):
    """Launch the backward kernel. `pix_lanes` [1, padded] i32 holds each
    lane's global pixel id (any order — the warm-start path feeds
    cost-sorted lanes); `g_lanes` [3, padded] the matching per-lane
    radiance cotangent (image cotangent already divided by spp, padded
    with zeros). Returns the parameter-matrix cotangent [16, N]."""
    n_spheres = p_mat.shape[1]
    padded = g_lanes.shape[1]
    if group is None:
        # Interpret mode (CPU CI) keeps one sample per lane: the
        # multi-device interpreter runs kernel bodies as io_callbacks on
        # a tiny host thread pool, and long-running callbacks (a
        # persistent multi-sample while loop) starve the pool against
        # its cross-device barriers — observed as a deadlock on the
        # 8-virtual-device CI mesh. Grouping is pure scheduling (it
        # never changes which paths are replayed), so CI still covers
        # the persistent-queue code path via single-device tests.
        group = 1 if interpret else _bwd_group(spp, max_depth, tile)
    grid = (-(-spp // group), padded // tile)
    kernel = functools.partial(
        _bwd_kernel, tile=tile, n_spheres=n_spheres, max_depth=max_depth,
        spp=spp, group=group,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((P_ROWS, n_spheres), lambda s, j, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_spheres, P_ROWS), lambda s, j, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda s, j, *_: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile), lambda s, j, *_: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (P_ROWS, n_spheres), lambda s, j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((group * max_depth * _TRAJ_ROWS, tile), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P_ROWS, n_spheres), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(scalars, cam_vec, p_mat, pt_mat, pix_lanes, g_lanes)


class _DiffCfg(NamedTuple):
    """Hashable static config for the custom_vjp pair.

    `n_lanes` is the number of flat pixels THIS call renders (a shard's
    slab, or the whole image single-chip); `n_pixels_total` the whole
    image's pixel count (lanes with global id beyond it are born dead).
    `spp` is the LOCAL sample count of this call (a shard's slice of the
    global budget). The pixel/sample offsets AND the seed are traced
    arguments, not config: shard_map traces ONE program for all shards,
    so anything that varies per shard must be data — and a traced seed
    means re-rendering with a new seed (or sample window) reuses the
    compiled program.
    """

    width: int
    n_lanes: int
    n_pixels_total: int
    spp: int
    max_depth: int
    tile: int
    n_passes: int
    budget: int
    bwd_tile: int
    bwd_group: int | None
    interpret: bool
    # Warm-start the PRIMAL from a prior step's cost map (the traced
    # `hint` argument of _diff_render_flat). The backward replay always
    # warm-starts from the SAME step's map regardless (_diff_bwd).
    use_hint: bool = False


# Cotangent for integer (pixel_offset, sample_offset) args: float0, the
# JAX tangent type of integer arrays.
def _int_zero_cotangent(x):
    return np.zeros(x.shape, jax.dtypes.float0)


def _primal_flat(cfg: _DiffCfg, p_mat, cam_vec, offsets, hint,
                 with_work=False):
    """Fast forward (ops/pallas_render._multipass) -> [3, n_lanes].

    `offsets` = i32 [3]: (global pixel id of lane 0, global sample index
    of local sample 0, seed). Output is in local-pixel order. With
    `with_work`, also returns the per-lane cost map [n_lanes] (the
    backward pass's warm-start signal). `hint` [n_lanes] warm-starts
    the primal schedule when cfg.use_hint (a prior step's cost map —
    the training-loop analogue of render_pallas's auto warm-start;
    pure scheduling, bit-identical primal).
    """
    from ray_tracing_in_one_weekend_tpu.ops.pallas_render import (
        _perm_from_hint,
    )

    padded = -(-cfg.n_lanes // cfg.tile) * cfg.tile
    scalars = jnp.stack(
        [offsets[2], offsets[0], offsets[1], jnp.int32(0)]
    )
    sf, si = _init_state(offsets[0], padded, cfg.n_pixels_total, cfg.spp)
    if cfg.use_hint:
        # Full cost sort of the carried map (pallas_render's warm
        # schedule): the in-step ~27 ms argsort buys ~70 ms of
        # occupancy over the two-level presort at the bench preset.
        padded_hint = jnp.zeros(padded, jnp.float32).at[: cfg.n_lanes].set(
            hint
        )
        perm2 = _perm_from_hint(padded_hint).reshape(2, padded)
        work_perm = (perm2[0], perm2[1])
    else:
        work_perm = None
    out = _multipass(
        p_mat, p_mat.T, cam_vec, scalars, sf, si,
        cfg.tile, cfg.spp, cfg.max_depth, cfg.budget, cfg.n_passes,
        cfg.interpret, work_perm=work_perm, with_work=with_work,
    )
    if with_work:
        rad, work = out
        return rad[:, : cfg.n_lanes], work[: cfg.n_lanes]
    return out[:, : cfg.n_lanes]


def _cost_perm(cost, tile):
    """Lane permutation that packs similar-cost lanes into the same
    tiles: a FULL global sort by descending cost. Rounds 3-4 used the
    two-level scheme of ops/pallas_render._compact (per-tile sort +
    block reorder) to dodge the ~1M-lane argsort's ~27 ms; round 5
    measured that the full sort's tile cost-HOMOGENEITY (not just
    density) is worth far more than the argsort costs — the forward
    warm schedule went 76% -> 96.3% occupancy — and the backward
    replay's per-iteration cost is several times the forward's, so the
    once-per-step argsort amortizes even better here. Returns the flat
    permutation `perm` (new[i] = old[perm[i]]). Zero-cost (dead/pad)
    lanes sink to the tail tiles, which then exit their while loops
    immediately. `tile` is unused by the full sort but kept so callers
    document the target layout."""
    del tile
    return jnp.argsort(-cost, stable=True).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _diff_render_flat(cfg: _DiffCfg, p_mat, cam_vec, offsets, hint):
    """Returns (rad [3, n_lanes], work [n_lanes]) — the rendered
    radiance plus the measured per-lane cost map, so a training loop
    can feed `work` back as the NEXT step's `hint` (the warm-start
    carry; see train_step_pallas)."""
    return _primal_flat(cfg, p_mat, cam_vec, offsets, hint, with_work=True)


def _diff_fwd(cfg, p_mat, cam_vec, offsets, hint):
    # The forward pass's per-lane cost map rides in the residuals: the
    # backward replay warm-starts from it (same step, no extra render).
    rad, work = _primal_flat(
        cfg, p_mat, cam_vec, offsets, hint, with_work=True
    )
    return (rad, work), (p_mat, cam_vec, offsets, hint, work)


def _diff_bwd(cfg, residuals, gbars):
    p_mat, cam_vec, offsets, hint, work = residuals
    gbar, _gwork = gbars  # the cost map is scheduling metadata: no grad
    padded = -(-cfg.n_lanes // cfg.bwd_tile) * cfg.bwd_tile
    # The call's output is the per-pixel MEAN over its spp samples: each
    # sample's radiance cotangent is the pixel cotangent / spp.
    g = jnp.zeros((3, padded), jnp.float32).at[:, : cfg.n_lanes].set(
        gbar / cfg.spp
    )
    # Warm-start the replay: pack cost-similar lanes into the same
    # tiles using the forward pass's measured per-pixel cost, so a
    # tile's max-of-sums queue collapses toward its mean (the replay
    # analogue of ops/pallas_render.py's work_hint; the kernel takes
    # per-lane pixel ids as data, so this is pure scheduling — the
    # gradient changes only by gacc summation order).
    cost = jnp.zeros(padded, jnp.float32).at[: cfg.n_lanes].set(work)
    perm = _cost_perm(cost, cfg.bwd_tile)
    pix_lanes = (offsets[0] + jnp.arange(padded, dtype=jnp.int32))[perm][None]
    g = g[:, perm]
    # scalars[3] (the backward kernel's live-lane bound) clips at the
    # slab end: lanes past it would replay pixels OUTSIDE this shard's
    # slab; their g is 0 so they contribute nothing, but idling them
    # skips the replay cost entirely.
    scalars = jnp.stack(
        [
            offsets[2],
            offsets[0],
            offsets[1],
            jnp.minimum(
                offsets[0] + cfg.n_lanes, jnp.int32(cfg.n_pixels_total)
            ),
        ]
    )
    grads = _pallas_bwd(
        p_mat, p_mat.T, cam_vec, scalars, pix_lanes, g,
        tile=cfg.bwd_tile, spp=cfg.spp, max_depth=cfg.max_depth,
        interpret=cfg.interpret, group=cfg.bwd_group,
    )
    return (grads, jnp.zeros_like(cam_vec), _int_zero_cotangent(offsets),
            jnp.zeros_like(hint))


_diff_render_flat.defvjp(_diff_fwd, _diff_bwd)

# Jitted entry: without this, every render_pallas_diff call re-traces
# the whole multipass pipeline eagerly (the same retrace bug shape the
# round-3 distributed path had). cfg is already the custom_vjp's static
# argument, so it doubles as the jit cache key.
_diff_render_flat_jit = jax.jit(_diff_render_flat, static_argnums=(0,))


def render_pallas_diff(
    scene: Scene,
    cam: Camera,
    seed: int = 0,
    spp: int | None = None,
    max_depth: int | None = None,
    tile: int = DEFAULT_TILE,
    bwd_tile: int = _DEFAULT_BWD_TILE,
    bwd_group: int | None = None,
    interpret: bool = False,
    n_passes: int | None = None,
    budget: int | None = None,
    sample_offset: int = 0,
    work_hint: jnp.ndarray | None = None,
    return_work: bool = False,
):
    """Differentiable Pallas render -> [H, W, 3] linear framebuffer.

    The VALUE is bit-identical to `render_pallas` (same forward kernel).
    Under `jax.grad`, scene-parameter gradients run through the Pallas
    backward kernel instead of jnp autodiff. Camera parameters receive
    zero gradient (same contract as parallel/dist.DIFF_FIELDS).

    `work_hint` warm-starts the PRIMAL schedule from a prior step's
    cost map ([H, W] or flat; `n_passes` then defaults to 1); with
    `return_work` the measured map comes back for the next step. This
    is the functional training-loop analogue of render_pallas's module
    cache — everything here may sit under jit/grad, where host-side
    caching is impossible, so the map is carried as data
    (train_step_pallas threads it automatically).
    """
    spp = cam.samples_per_pixel if spp is None else spp
    max_depth = cam.max_depth if max_depth is None else max_depth
    use_hint = work_hint is not None
    if n_passes is None:
        n_passes = 1 if use_hint else DEFAULT_PASSES
    budget = _default_budget(spp) if budget is None else budget
    n_pixels = cam.image_width * cam.image_height
    cfg = _DiffCfg(
        width=cam.image_width,
        n_lanes=n_pixels,
        n_pixels_total=n_pixels,
        spp=spp,
        max_depth=max_depth,
        tile=tile,
        n_passes=n_passes,
        budget=budget,
        bwd_tile=bwd_tile,
        bwd_group=bwd_group,
        interpret=interpret,
        use_hint=use_hint,
    )
    p_mat = pack_scene(scene)
    cam_vec = jnp.asarray(pack_camera(cam))
    offsets = jnp.asarray([0, sample_offset, seed], jnp.int32)
    if use_hint:
        hint = jnp.asarray(work_hint, jnp.float32).reshape(-1)[:n_pixels]
    else:
        hint = jnp.zeros((1,), jnp.float32)
    rad, work = _diff_render_flat_jit(cfg, p_mat, cam_vec, offsets, hint)
    img = jnp.transpose(rad).reshape(cam.image_height, cam.image_width, 3)
    if return_work:
        return img, work.reshape(cam.image_height, cam.image_width)
    return img


def render_pallas_diff_distributed(
    scene: Scene,
    cam: Camera,
    seed: int = 0,
    mesh=None,
    spp: int | None = None,
    max_depth: int | None = None,
    tile: int = DEFAULT_TILE,
    bwd_tile: int = _DEFAULT_BWD_TILE,
    bwd_group: int | None = None,
    interpret: bool = False,
    n_passes: int | None = None,
    budget: int | None = None,
    sample_offset: int = 0,
    work_hint: jnp.ndarray | None = None,
    return_work: bool = False,
):
    """Mesh-sharded differentiable Pallas render -> [H, W, 3].

    Forward = `render_pallas_distributed`'s layout exactly (pixel-slab +
    sample-slice shards, pmean over the sample axis); backward = each
    shard runs the Pallas backward kernel on its own (slab, sample
    slice) and the `[16, N]` parameter cotangent comes out psum-reduced
    over BOTH mesh axes automatically (the replicated-input gradient
    rule of shard_map — the DP gradient all-reduce of SURVEY.md §2.2,
    riding ICI). Because lanes key their RNG streams on GLOBAL
    (pixel, sample) ids, both the image and the gradients are
    bit-identical to the single-chip kernel for any mesh shape
    (tests/test_pallas_grad.py).
    """
    from jax.sharding import PartitionSpec as P

    from ray_tracing_in_one_weekend_tpu.parallel.dist import (
        PIXEL_AXIS,
        SAMPLE_AXIS,
        make_mesh,
    )

    if mesh is None:
        mesh = make_mesh()
    spp = cam.samples_per_pixel if spp is None else spp
    max_depth = cam.max_depth if max_depth is None else max_depth
    use_hint = work_hint is not None
    if n_passes is None:
        n_passes = 1 if use_hint else DEFAULT_PASSES

    n_pix_shards = mesh.shape[PIXEL_AXIS]
    n_smp_shards = mesh.shape[SAMPLE_AXIS]
    if spp % n_smp_shards != 0:
        raise ValueError(
            f"samples_per_pixel={spp} must divide evenly over the "
            f"'{SAMPLE_AXIS}' mesh axis of size {n_smp_shards}"
        )
    spp_local = spp // n_smp_shards
    budget = _default_budget(spp_local) if budget is None else budget

    w, h = cam.image_width, cam.image_height
    n_pixels = w * h
    shard_pixels = -(-n_pixels // (n_pix_shards * tile)) * tile
    total = n_pix_shards * shard_pixels

    cfg = _DiffCfg(
        width=w,
        n_lanes=shard_pixels,
        n_pixels_total=n_pixels,
        spp=spp_local,
        max_depth=max_depth,
        tile=tile,
        n_passes=n_passes,
        budget=budget,
        bwd_tile=bwd_tile,
        bwd_group=bwd_group,
        interpret=interpret,
        use_hint=use_hint,
    )
    p_mat = pack_scene(scene)
    cam_vec = jnp.asarray(pack_camera(cam))
    base = jnp.asarray([sample_offset, seed], jnp.int32)
    if use_hint:
        # Slab layout = zero-padded flat global-pixel order (slabs are
        # contiguous pixel ranges), same convention as the forward
        # distributed path.
        hint = jnp.zeros(total, jnp.float32).at[:n_pixels].set(
            jnp.asarray(work_hint, jnp.float32).reshape(-1)[:n_pixels]
        ).reshape(n_pix_shards, shard_pixels)
    else:
        hint = jnp.zeros((n_pix_shards, 1), jnp.float32)
    out, work = _diff_dist_jit(
        cfg, p_mat, cam_vec, base, hint,
        mesh=mesh, n_pix_shards=n_pix_shards,
    )  # [3, total], [total]

    img = jnp.transpose(out[:, :n_pixels]).reshape(h, w, 3)
    if return_work:
        return img, work[:n_pixels].reshape(h, w)
    return img


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("mesh", "n_pix_shards")
)
def _diff_dist_jit(cfg: _DiffCfg, p_mat, cam_vec, base, hint, *, mesh,
                   n_pix_shards):
    """Sharded differentiable render as ONE jitted program, cached on
    (cfg, mesh) at module level; `base` = i32 [2] (sample_offset, seed)
    is traced data (same retrace fix as _render_dist_jit). `hint` is
    the primal warm-start map in slab layout [n_pix_shards, ...];
    returns (rad [3, total], work [total])."""
    from jax.sharding import PartitionSpec as P

    from ray_tracing_in_one_weekend_tpu.parallel.dist import (
        PIXEL_AXIS,
        SAMPLE_AXIS,
    )

    slab_offsets = (
        jnp.arange(n_pix_shards, dtype=jnp.int32) * cfg.n_lanes
    )[:, None]

    def shard_fn(p_mat, cam_vec, base, slab_offset, hint_slab):
        s_idx = jax.lax.axis_index(SAMPLE_AXIS).astype(jnp.int32)
        offsets = jnp.stack(
            [slab_offset[0, 0], s_idx * cfg.spp + base[0], base[1]]
        )
        rad, work = _diff_render_flat(
            cfg, p_mat, cam_vec, offsets, hint_slab.reshape(-1)
        )
        return (
            jax.lax.pmean(rad, SAMPLE_AXIS),
            jax.lax.pmean(work, SAMPLE_AXIS),
        )

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(PIXEL_AXIS, None), P(PIXEL_AXIS, None)),
        out_specs=(P(None, PIXEL_AXIS), P(PIXEL_AXIS)),
        check_vma=False,
    )(p_mat, cam_vec, base, slab_offsets, hint)


# Scene leaves that receive gradients (matches parallel/dist.DIFF_FIELDS).
DIFF_FIELDS = ("center", "radius", "albedo", "fuzz", "ior")


def render_loss_pallas(
    params: dict, scene: Scene, cam: Camera, target: jnp.ndarray,
    mesh=None, return_work: bool = False, **kw
):
    """Mean-squared pixel loss of the kernel render against `target`.
    With `mesh`, the forward/backward kernels run sharded over it. With
    `return_work`, returns (loss, work) where `work` is the step's
    [H, W] cost map (feed back as next step's `work_hint` to warm-start
    the primal — the training-loop warm-start carry)."""
    s = scene.replace(**params)
    fn = (
        functools.partial(render_pallas_diff_distributed, mesh=mesh)
        if mesh is not None else render_pallas_diff
    )
    out = fn(s, cam, return_work=return_work, **kw)
    img, work = out if return_work else (out, None)
    loss = jnp.mean((img - target) ** 2)
    if return_work:
        return loss, work
    return loss


def render_grads_pallas(
    params: dict, scene: Scene, cam: Camera, target: jnp.ndarray,
    mesh=None, return_work: bool = False, **kw
):
    """(loss, grads) of the Pallas render w.r.t. scene parameters —
    the kernel-speed counterpart of parallel/dist.render_grads. With
    `mesh`, gradients are computed shard-locally and psum-reduced over
    the mesh (parallel/dist.py's DP gradient all-reduce, at kernel
    speed). With `return_work`: ((loss, work), grads)."""
    return jax.value_and_grad(render_loss_pallas, has_aux=return_work)(
        params, scene, cam, target, mesh=mesh, return_work=return_work, **kw
    )


def train_step_pallas(
    params: dict, scene: Scene, cam: Camera, target: jnp.ndarray,
    mesh=None, lr: float = 1e-2, work_hint=None, return_work: bool = False,
    **kw
):
    """One SGD step of inverse rendering at kernel speed: returns
    (loss, new_params) — the Pallas twin of parallel/dist.train_step.

    Warm-start carry: pass the previous step's `work` back as
    `work_hint` and set `return_work=True` to get (loss, new_params,
    work) — the primal then pre-sorts its lanes by the prior step's
    measured cost map and runs the single-pass warm schedule (the
    backward replay already warm-starts from the SAME step's map
    unconditionally). Pure scheduling: loss and gradients are
    unchanged for any hint."""
    if return_work:
        (loss, work), grads = render_grads_pallas(
            params, scene, cam, target, mesh=mesh, return_work=True,
            work_hint=work_hint, **kw
        )
    else:
        loss, grads = render_grads_pallas(
            params, scene, cam, target, mesh=mesh, work_hint=work_hint, **kw
        )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    if return_work:
        return loss, new_params, work
    return loss, new_params
