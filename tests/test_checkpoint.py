"""Checkpoint/resume: progressive accumulation is bit-identical to a
single monolithic render (the global sample-stream property)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.ops.render import render
from ray_tracing_in_one_weekend_tpu.utils import checkpoint as ckpt

KEY = jax.random.key(3)


def _setup():
    sc = scene_lib.single_sphere_scene(pad_to=8)
    cam = make_camera(
        image_width=24,
        aspect_ratio=2.0,
        samples_per_pixel=8,
        max_depth=4,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )
    return sc, cam


def test_batched_accumulation_matches_monolithic():
    sc, cam = _setup()
    # monolithic 8-spp render
    mono = np.asarray(render(sc, cam, KEY, chunk_size=128, spp=8))

    # 3+1+4 progressive batches
    state = ckpt.new_state(cam)
    for batch in (3, 1, 4):
        state = ckpt.accumulate(state, sc, cam, KEY, batch, chunk_size=128)
    assert int(state.spp_done) == 8
    np.testing.assert_allclose(np.asarray(state.image), mono, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    sc, cam = _setup()
    state = ckpt.new_state(cam)
    state = ckpt.accumulate(state, sc, cam, KEY, 3, chunk_size=128)

    path = os.path.join(tmp_path, "state.npz")
    ckpt.save(state, path)
    loaded = ckpt.load(path)
    assert int(loaded.spp_done) == 3
    np.testing.assert_array_equal(np.asarray(loaded.accum), np.asarray(state.accum))

    # resume from disk and finish; equals monolithic
    loaded = ckpt.accumulate(loaded, sc, cam, KEY, 5, chunk_size=128)
    mono = np.asarray(render(sc, cam, KEY, chunk_size=128, spp=8))
    np.testing.assert_allclose(np.asarray(loaded.image), mono, atol=1e-6)


def test_empty_state_image_is_zero():
    _, cam = _setup()
    state = ckpt.new_state(cam)
    assert float(jnp.abs(state.image).max()) == 0.0


# ---------------------------------------------------------------------------
# Checkpoint x Pallas x mesh (round-3): progressive accumulation through
# the kernel and/or a device mesh covers the same global sample set, so
# it matches the monolithic render of the same backend.
# ---------------------------------------------------------------------------

from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas
from ray_tracing_in_one_weekend_tpu.parallel.dist import make_mesh


def _pallas_setup():
    sc = scene_lib.single_sphere_scene(pad_to=128)
    cam = make_camera(
        image_width=32,
        aspect_ratio=2.0,
        samples_per_pixel=8,
        max_depth=4,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )
    return sc, cam


def test_pallas_accumulation_matches_monolithic():
    """Kernel-backend progressive accumulation: the kernel's streams key
    on scalars[2]+sample index, so batches [0,3)+[3,4)+[4,8) render the
    exact same sample values as one 8-spp run (bitwise, modulo the f32
    accumulation order of the final mean: atol 1e-6)."""
    sc, cam = _pallas_setup()
    mono = np.asarray(
        render_pallas(sc, cam, seed=3, tile=128, interpret=True, spp=8)
    )
    state = ckpt.new_state(cam)
    for batch in (3, 1, 4):
        state = ckpt.accumulate(
            state, sc, cam, 3, batch, backend="pallas", tile=128,
            interpret=True,
        )
    assert int(state.spp_done) == 8
    np.testing.assert_allclose(np.asarray(state.image), mono, atol=1e-6)


def test_pallas_mesh_accumulation_matches_single_chip():
    """Kernel + mesh + checkpoint composed: sample shards split each
    batch, so any schedule covers global samples {0..7} exactly once."""
    sc, cam = _pallas_setup()
    mono = np.asarray(
        render_pallas(sc, cam, seed=3, tile=128, interpret=True, spp=8)
    )
    mesh = make_mesh((2, 2))
    state = ckpt.new_state(cam)
    for batch in (4, 4):
        state = ckpt.accumulate(
            state, sc, cam, 3, batch, backend="pallas", mesh=mesh,
            tile=128, interpret=True,
        )
    assert int(state.spp_done) == 8
    np.testing.assert_allclose(np.asarray(state.image), mono, atol=1e-6)


def test_jnp_mesh_accumulation_matches_monolithic():
    sc, cam = _setup()
    mono = np.asarray(render(sc, cam, KEY, chunk_size=128, spp=8))
    mesh = make_mesh((2, 2))
    state = ckpt.new_state(cam)
    for batch in (2, 6):
        state = ckpt.accumulate(
            state, sc, cam, KEY, batch, chunk_size=128, mesh=mesh
        )
    assert int(state.spp_done) == 8
    np.testing.assert_allclose(np.asarray(state.image), mono, atol=1e-6)
