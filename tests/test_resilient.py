"""Elastic recovery (utils/resilient.py): fault injection.

The reference's failure handling is fail-stop exit(99)
(reference: src/gpu/cuda_utility.h:8-18); SURVEY.md §5 lists
batch-grain re-render as the optional upgrade. These tests inject
transient faults (raised device errors; NaN-corrupted batches) into the
underlying render function and assert the recovered image is
BIT-IDENTICAL to a fault-free run — the global sample-stream keying
makes a re-rendered batch indistinguishable from one that never failed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import make_camera
from ray_tracing_in_one_weekend_tpu.ops import render as render_mod
from ray_tracing_in_one_weekend_tpu.utils import resilient
from ray_tracing_in_one_weekend_tpu.utils.resilient import (
    BatchCorruptError,
    RetryStats,
    render_resilient,
)

KEY = jax.random.key(0)


def _cam(spp=8):
    return make_camera(
        image_width=32,
        aspect_ratio=2.0,
        samples_per_pixel=spp,
        max_depth=6,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )


class _Flaky:
    """Wraps render_flat; fails on chosen (0-indexed) calls."""

    def __init__(self, real, fail_calls, kind="raise"):
        self.real = real
        self.fail_calls = set(fail_calls)
        self.kind = kind
        self.calls = 0

    def __call__(self, *a, **kw):
        i = self.calls
        self.calls += 1
        if i in self.fail_calls:
            if self.kind == "raise":
                raise RuntimeError("injected transient device fault")
            out = self.real(*a, **kw)
            return out.at[0].set(jnp.nan)  # corrupt one pixel
        return self.real(*a, **kw)


@pytest.fixture()
def scene():
    return scene_lib.single_sphere_scene(pad_to=128)


@pytest.fixture()
def golden(scene):
    """Fault-free resilient render with the same batch schedule the
    faulty runs use. (A monolithic render agrees to float tolerance
    only — the per-batch mean*count accumulation reorders the f32 sums
    by an ulp — so the bit-level oracle is the batched run itself.)"""
    cam = _cam()
    img = np.asarray(render_resilient(scene, cam, KEY, spp_batch=2))
    from ray_tracing_in_one_weekend_tpu.ops.render import render_image

    mono = np.asarray(render_image(scene, cam, KEY))
    np.testing.assert_allclose(img, mono, atol=1e-6)
    return img


@pytest.mark.parametrize("kind", ["raise", "nan"])
def test_transient_fault_recovered_bit_identical(scene, golden, kind, monkeypatch):
    cam = _cam()
    flaky = _Flaky(render_mod.render_flat, fail_calls={1, 2}, kind=kind)
    monkeypatch.setattr(
        "ray_tracing_in_one_weekend_tpu.utils.checkpoint.render_flat", flaky
    )
    stats = RetryStats()
    img = np.asarray(
        render_resilient(scene, cam, KEY, spp_batch=2, max_retries=2,
                         stats=stats, log=lambda *a: None)
    )
    assert stats.retries == 2 and stats.batches == 4
    kinds = {k for _, k, _ in stats.failures}
    assert kinds == ({"RuntimeError"} if kind == "raise" else {"BatchCorruptError"})
    assert np.array_equal(img, golden), (
        "recovered image must be bit-identical to the fault-free run"
    )


def test_retry_budget_exhaustion_fails_stop(scene, monkeypatch):
    cam = _cam()
    # Deterministic failure: every attempt of batch 1 fails.
    flaky = _Flaky(render_mod.render_flat, fail_calls={1, 2, 3}, kind="raise")
    monkeypatch.setattr(
        "ray_tracing_in_one_weekend_tpu.utils.checkpoint.render_flat", flaky
    )
    with pytest.raises(RuntimeError, match="injected"):
        render_resilient(scene, cam, KEY, spp_batch=2, max_retries=2,
                         log=lambda *a: None)


def test_process_grain_resume_after_crash(scene, golden, tmp_path, monkeypatch):
    """A failure that exhausts retries (process death analogue) resumes
    from the checkpoint on the next invocation, and the final image is
    still bit-identical to the fault-free run."""
    cam = _cam()
    path = str(tmp_path / "resume.npz")
    flaky = _Flaky(render_mod.render_flat, fail_calls={2}, kind="raise")
    monkeypatch.setattr(
        "ray_tracing_in_one_weekend_tpu.utils.checkpoint.render_flat", flaky
    )
    with pytest.raises(RuntimeError):
        render_resilient(scene, cam, KEY, spp_batch=2, max_retries=0,
                         checkpoint_path=path, log=lambda *a: None)
    # "Restarted process": renderer healed, resume from checkpoint.
    monkeypatch.setattr(
        "ray_tracing_in_one_weekend_tpu.utils.checkpoint.render_flat",
        render_mod.render_flat,
    )
    img = np.asarray(
        render_resilient(scene, cam, KEY, spp_batch=2,
                         checkpoint_path=path, log=lambda *a: None)
    )
    assert np.array_equal(img, golden)
