"""Statistical tests for the closed-form samplers that replace the
reference's rejection loops (SURVEY.md §7 hard part (c): compare via
mean/variance, not bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracing_in_one_weekend_tpu.ops import sampling

KEY = jax.random.key(42)
N = 200_000


def test_unit_vector_on_sphere():
    v = sampling.random_unit_vector(KEY, (N,))
    norms = np.linalg.norm(np.asarray(v), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # isotropy: component means ~0, component second moment = 1/3
    np.testing.assert_allclose(np.mean(np.asarray(v), axis=0), 0.0, atol=0.01)
    np.testing.assert_allclose(np.mean(np.asarray(v) ** 2, axis=0), 1 / 3, atol=0.01)


def test_in_unit_sphere_uniform_ball():
    p = np.asarray(sampling.random_in_unit_sphere(KEY, (N,)))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform ball: E[r] = 3/4, P(r < 0.5) = 0.125
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)
    np.testing.assert_allclose((r < 0.5).mean(), 0.125, atol=0.01)


def test_in_unit_disk_uniform():
    p = np.asarray(sampling.random_in_unit_disk(KEY, (N,)))
    np.testing.assert_array_equal(p[:, 2], 0.0)
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # uniform disk: E[r] = 2/3, P(r < 0.5) = 0.25
    np.testing.assert_allclose(r.mean(), 2 / 3, atol=0.01)
    np.testing.assert_allclose((r < 0.5).mean(), 0.25, atol=0.01)


def test_on_hemisphere_faces_normal():
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (1000, 3))
    v = sampling.random_on_hemisphere(KEY, normal)
    assert np.all(np.sum(np.asarray(v) * np.asarray(normal), axis=-1) > 0)


def test_per_ray_keys_layout_invariant():
    """Splitting a batch of keys across 'shards' must not change draws —
    the property that makes RNG shard-layout invariant (SURVEY.md §7 (d))."""
    keys = jax.vmap(lambda i: jax.random.fold_in(KEY, i))(jnp.arange(64))
    full = sampling.uniform_b(keys)
    halves = jnp.concatenate([sampling.uniform_b(keys[:32]), sampling.uniform_b(keys[32:])])
    np.testing.assert_array_equal(np.asarray(full), np.asarray(halves))


def test_fold_b_scalar_and_array():
    keys = jax.vmap(lambda i: jax.random.fold_in(KEY, i))(jnp.arange(8))
    a = sampling.fold_b(keys, 3)
    b = sampling.fold_b(keys, jnp.full(8, 3))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a)), np.asarray(jax.random.key_data(b))
    )
