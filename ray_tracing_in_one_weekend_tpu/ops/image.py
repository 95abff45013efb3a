"""Color pipeline: sample mean -> gamma 2 -> clamp -> 8-bit quantization.

Reproduces the reference's `write_color` exactly
(reference: src/gpu/color.h:12-38, src/cpu/color.h:8-23):

    mean  = pixel_sum / samples_per_pixel        (done in ops/render.py)
    gamma = sqrt(mean)                            ("gamma 2", linear_to_gamma)
    byte  = int(256 * clamp(gamma, 0, 0.999))

The renderer's framebuffer stays linear float32; this module is the
boundary where it becomes displayable. (The old GPU tree skipped the
clamp and used a 255.99 scale, reference: src/gpu-old/main.cu:217-219 —
a defect we do not reproduce.)
"""

from __future__ import annotations

import jax.numpy as jnp

# Clamp ceiling before the 256 scale (reference: src/gpu/color.h:30-33).
_CLAMP_MAX = 0.999


def linear_to_gamma(linear: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2 transform: sqrt of the non-negative part
    (reference: src/gpu/color.h:12-14)."""
    return jnp.sqrt(jnp.maximum(linear, 0.0))


def to_uint8(linear_image: jnp.ndarray) -> jnp.ndarray:
    """Linear [H, W, 3] float -> gamma-corrected uint8 [H, W, 3]
    (reference: src/gpu/color.h:16-38)."""
    gamma = linear_to_gamma(linear_image)
    clamped = jnp.clip(gamma, 0.0, _CLAMP_MAX)
    return (256.0 * clamped).astype(jnp.uint8)
