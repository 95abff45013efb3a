"""checkify-based NaN guards (utils/debug.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.utils import debug


def _cam():
    return make_camera(
        image_width=16,
        aspect_ratio=2.0,
        samples_per_pixel=2,
        max_depth=4,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )


def test_clean_render_passes():
    sc = scene_lib.single_sphere_scene(pad_to=8)
    err, img = debug.checked_render(sc, _cam(), 0, chunk_size=128)
    err.throw()  # no error
    assert img.shape == (8, 16, 3)


def test_poisoned_scene_is_caught():
    sc = scene_lib.single_sphere_scene(pad_to=8)
    sc = sc.replace(center=sc.center.at[0, 0].set(jnp.nan))
    err, _ = debug.checked_render(sc, _cam(), 0, chunk_size=128)
    with pytest.raises(Exception):
        err.throw()


def test_assert_finite_tree():
    debug.assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(AssertionError, match="non-finite"):
        debug.assert_finite_tree({"a": jnp.asarray([1.0, jnp.inf])}, "params")
