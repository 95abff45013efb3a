"""Book-milestone scenes and shading modes (fixture breadth, VERDICT r3).

The reference ships one committed render per book milestone
(gallery/cpu/image1..21.png) with the generating code snapshot in
archive/listing1..70 — its de-facto test fixtures (SURVEY.md §4). This
module reproduces the intermediate milestones the final renderer no
longer exercises: normals shading, the interim hemisphere-diffuse
model, and the three-sphere material tableaus. Each builder cites the
archive listing it reproduces; tests/test_milestones.py renders them
live and checks block-mean statistical parity against the committed
reference gallery images.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ray_tracing_in_one_weekend_tpu.models import scene as scene_lib
from ray_tracing_in_one_weekend_tpu.models.camera import Camera, get_rays, make_camera
from ray_tracing_in_one_weekend_tpu.models.scene import (
    DIELECTRIC,
    LAMBERTIAN,
    METAL,
    Scene,
)
from ray_tracing_in_one_weekend_tpu.ops import sampling
from ray_tracing_in_one_weekend_tpu.ops import vecmath as vm
from ray_tracing_in_one_weekend_tpu.ops.integrator import sky_color
from ray_tracing_in_one_weekend_tpu.ops.intersect import hit_scene


def book_camera(image_width: int = 400, spp: int = 100, max_depth: int = 50,
                aspect_ratio: float = 16.0 / 9.0) -> Camera:
    """The book's fixed pre-positionable camera: origin at 0 looking
    down -z, 16:9, viewport height 2, focal length 1 (equivalently
    vfov = 2*atan(1) = 90 degrees)
    (reference: archive/listing62/camera.h:6-24). `aspect_ratio=2.0`
    gives the v2-era 200x100 framing of the close-up goldens
    (reference: gallery/cpu/image13.png is 200x100)."""
    return make_camera(
        image_width=image_width,
        aspect_ratio=aspect_ratio,
        samples_per_pixel=spp,
        max_depth=max_depth,
        vfov_degrees=90.0,
        lookfrom=(0.0, 0.0, 0.0),
        lookat=(0.0, 0.0, -1.0),
        defocus_angle_degrees=0.0,
        focus_dist=1.0,
    )


def positioned_camera(
    image_width: int = 400, spp: int = 100, max_depth: int = 50,
    vfov_degrees: float = 90.0, lookfrom=(-2.0, 2.0, 1.0),
    lookat=(0.0, 0.0, -1.0), defocus_angle_degrees: float = 0.0,
    aperture: float | None = None, focus_dist: float = 1.0,
) -> Camera:
    """The positionable-camera milestones' cameras:

    * wide view  — `camera cam(point3(-2,2,1), point3(0,0,-1),
      vec3(0,1,0), 90, aspect)` (reference: archive/listing65/main.cc:65;
      golden gallery/cpu/image18)
    * zoomed     — same with vfov 20
      (reference: archive/listing66/main.cc:65; golden image19)
    * defocus    — `lookfrom(3,3,2)`, aperture 2.0,
      `dist_to_focus = (lookfrom-lookat).length()`
      (reference: archive/listing69/main.cc:65-71; golden image20)
    """
    return make_camera(
        image_width=image_width,
        aspect_ratio=16.0 / 9.0,
        samples_per_pixel=spp,
        max_depth=max_depth,
        vfov_degrees=vfov_degrees,
        lookfrom=lookfrom,
        lookat=lookat,
        vup=(0.0, 1.0, 0.0),
        defocus_angle_degrees=defocus_angle_degrees,
        aperture=aperture,
        focus_dist=focus_dist,
    )


def sphere_ground_scene(pad_to: int = 128) -> Scene:
    """Sphere (0,0,-1) r=0.5 over ground sphere (0,-100.5,-1) r=100 —
    the geometry of every pre-material milestone
    (reference: archive/listing24/main.cc world; also
    src/gpu-old equivalents). Materials set to gray lambertian 0.5 (the
    first-diffuse milestone's implicit 0.5 bounce factor,
    reference: archive/listing30/main.cc ray_color)."""
    return scene_lib.from_spheres(
        centers=[[0.0, 0.0, -1.0], [0.0, -100.5, -1.0]],
        radii=[0.5, 100.0],
        mat_types=[LAMBERTIAN, LAMBERTIAN],
        albedos=[[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]],
        pad_to=pad_to,
    )


def metal_trio_scene(
    fuzz_left: float = 0.0, fuzz_right: float = 0.0, pad_to: int = 128
) -> Scene:
    """The first-metal tableau: yellow ground, diffuse (0.7,0.3,0.3)
    center, silver (0.8,0.8,0.8) left, gold (0.8,0.6,0.2) right
    (reference: archive/listing50/main.cc:15-23; the fuzzed variant
    with fuzz 0.3 / 1.0 is archive/listing52/main.cc:55-56)."""
    return scene_lib.from_spheres(
        centers=[
            [0.0, -100.5, -1.0],
            [0.0, 0.0, -1.0],
            [-1.0, 0.0, -1.0],
            [1.0, 0.0, -1.0],
        ],
        radii=[100.0, 0.5, 0.5, 0.5],
        mat_types=[LAMBERTIAN, LAMBERTIAN, METAL, METAL],
        albedos=[
            [0.8, 0.8, 0.0],
            [0.7, 0.3, 0.3],
            [0.8, 0.8, 0.8],
            [0.8, 0.6, 0.2],
        ],
        fuzzes=[0.0, 0.0, fuzz_left, fuzz_right],
        pad_to=pad_to,
    )


def glass_trio_scene(hollow: bool = False, pad_to: int = 128) -> Scene:
    """The dielectric tableau: yellow ground, blue (0.1,0.2,0.5)
    diffuse center, glass (ior 1.5) left, gold sharp metal right
    (reference: archive/listing59/main.cc:53-61). `hollow=True` adds
    the negative-radius inner sphere (r=-0.45) that turns the left
    sphere into the book's hollow glass bubble
    (reference: src/cpu/main.cc analogue; the signed radius flips the
    outward normal, ops/intersect.py)."""
    centers = [
        [0.0, -100.5, -1.0],
        [0.0, 0.0, -1.0],
        [-1.0, 0.0, -1.0],
        [1.0, 0.0, -1.0],
    ]
    radii = [100.0, 0.5, 0.5, 0.5]
    mats = [LAMBERTIAN, LAMBERTIAN, DIELECTRIC, METAL]
    albedos = [
        [0.8, 0.8, 0.0],
        [0.1, 0.2, 0.5],
        [1.0, 1.0, 1.0],
        [0.8, 0.6, 0.2],
    ]
    if hollow:
        centers.append([-1.0, 0.0, -1.0])
        radii.append(-0.45)
        mats.append(DIELECTRIC)
        albedos.append([1.0, 1.0, 1.0])
    return scene_lib.from_spheres(
        centers=centers, radii=radii, mat_types=mats, albedos=albedos,
        pad_to=pad_to,
    )


def two_sphere_wide_scene(pad_to: int = 128) -> Scene:
    """The wide-angle fov test: two touching R = cos(pi/4) spheres,
    blue left / red right, filling the 90-degree viewport
    (reference: archive/listing63/main.cc:51-57; golden
    gallery/cpu/image17)."""
    r = math.cos(math.pi / 4.0)
    return scene_lib.from_spheres(
        centers=[[-r, 0.0, -1.0], [r, 0.0, -1.0]],
        radii=[r, r],
        mat_types=[LAMBERTIAN, LAMBERTIAN],
        albedos=[[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]],
        pad_to=pad_to,
    )


def refract_trio_scene(pad_to: int = 128) -> Scene:
    """The dielectric-chapter test tableau: yellow ground, glass CENTER
    and glass left, fuzz-1.0 gold metal right
    (reference: archive/listing55/main.cc:53-61; the 200x100 close-up
    golden gallery/cpu/image13 renders it with the v2-era
    refract-or-absorb dielectric, see render_v2_dielectric)."""
    return scene_lib.from_spheres(
        centers=[
            [0.0, -100.5, -1.0],
            [0.0, 0.0, -1.0],
            [-1.0, 0.0, -1.0],
            [1.0, 0.0, -1.0],
        ],
        radii=[100.0, 0.5, 0.5, 0.5],
        mat_types=[LAMBERTIAN, DIELECTRIC, DIELECTRIC, METAL],
        albedos=[
            [0.8, 0.8, 0.0],
            [1.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
            [0.8, 0.6, 0.2],
        ],
        fuzzes=[0.0, 0.0, 0.0, 1.0],
        pad_to=pad_to,
    )


def single_sphere_sky_scene(pad_to: int = 128) -> Scene:
    """The lone r=0.5 sphere at (0,0,-1) of the earliest ray-tracing
    milestones (reference: archive/listing10/main.cc:17,
    archive/listing11/main.cc:21) — no ground sphere yet."""
    return scene_lib.from_spheres(
        centers=[[0.0, 0.0, -1.0]],
        radii=[0.5],
        mat_types=[LAMBERTIAN],
        albedos=[[0.5, 0.5, 0.5]],
        pad_to=pad_to,
    )


# ---------------------------------------------------------------------------
# Milestone shading modes the final integrator no longer has.
# ---------------------------------------------------------------------------


def first_gradient_image(width: int, height: int) -> jnp.ndarray:
    """The book's very first output: the u8 RGB gradient written before
    any ray exists — r = i/(w-1), g = j/(h-1) with j from the TOP
    (written scanline image_height-1 first), b = 0.25, quantized by
    int(255.999 * x) (reference: archive/listing1/main.cc:15-23;
    golden gallery/cpu/image1). Returns the exact u8 image [H, W, 3]."""
    i = jnp.broadcast_to(jnp.arange(width)[None, :], (height, width))
    j = jnp.broadcast_to(
        jnp.arange(height - 1, -1, -1)[:, None], (height, width)
    )
    r = (255.999 * i / (width - 1)).astype(jnp.uint8)
    g = (255.999 * j / (height - 1)).astype(jnp.uint8)
    b = jnp.full((height, width), int(255.999 * 0.25), jnp.uint8)
    return jnp.stack([r, g, b], axis=-1)


def render_hit_flag(
    scene: Scene, cam: Camera, base_key: jax.Array, spp: int = 4,
    flag_color=(1.0, 0.0, 0.0),
) -> jnp.ndarray:
    """The first ray-sphere image: solid `flag_color` on ANY hit, sky
    gradient otherwise — the book's boolean `hit_sphere` shading
    (reference: archive/listing10/main.cc:7-21; golden
    gallery/cpu/image3 with the red sphere). Primary rays only.
    Returns [H, W, 3] linear radiance."""
    w, h = cam.image_width, cam.image_height
    pix = jnp.arange(w * h)
    px, py = pix % w, pix // w
    pixel_keys = sampling.fold_b(jnp.broadcast_to(base_key, pix.shape), pix)
    flag = jnp.asarray(flag_color, jnp.float32)

    def sample_body(s, acc):
        keys = sampling.fold_b(pixel_keys, s)
        o, d = get_rays(cam, px, py, sampling.fold_b(keys, 0))
        rec = hit_scene(scene, o, d)
        sky = sky_color(vm.unit_vector(d))
        return acc + jnp.where(rec.hit[:, None], flag, sky)

    total = jax.lax.fori_loop(
        0, spp, sample_body, jnp.zeros((w * h, 3), jnp.float32)
    )
    return (total / spp).reshape(h, w, 3)


def render_v2_dielectric(
    scene: Scene, cam: Camera, base_key: jax.Array,
    spp: int = 16, max_depth: int = 50, mode: str = "always_refract",
) -> jnp.ndarray:
    """The pre-Schlick dielectric milestones, two modes:

    * `mode="always_refract"` — scatter = refract(unit_in, n, ratio)
      unconditionally, where refract puts sqrt(FABS(1 - |r_perp|^2)) in
      the parallel term (reference: archive/listing54/material.h:57-67
      + archive/listing53/vec3.h:126-131) — no TIR branch, no Schlick,
      never absorbs. The 'glass that always refracts' golden
      (gallery/cpu/image14).
    * `mode="tir_reflect"` — refract unless total internal reflection,
      mirror-reflect on TIR, still no Schlick (reference:
      archive/listing58/material.h:53-80). The deep internal-reflection
      chains at the rim band produce the dark rings of the 200x100
      close-up golden (gallery/cpu/image13).

    Lambertian/metal behave as in the final integrator
    (ops/materials.py). Returns [H, W, 3] linear radiance."""
    w, h = cam.image_width, cam.image_height
    pix = jnp.arange(w * h)
    px, py = pix % w, pix // w
    pixel_keys = sampling.fold_b(jnp.broadcast_to(base_key, pix.shape), pix)

    from ray_tracing_in_one_weekend_tpu.models.scene import DIELECTRIC as DIEL
    from ray_tracing_in_one_weekend_tpu.ops.materials import scatter_sampled

    def sample_body(s, acc):
        keys = sampling.fold_b(pixel_keys, s)
        o, d = get_rays(cam, px, py, sampling.fold_b(keys, 0))
        trace_keys = sampling.fold_b(keys, 1)
        n = pix.shape[0]

        def bounce(i, carry):
            o, d, atten, radiance, alive = carry
            rec = hit_scene(scene, o, d)
            sky = sky_color(vm.unit_vector(d))
            miss = alive & ~rec.hit
            radiance = radiance + jnp.where(
                miss[:, None], atten * sky, 0.0
            )
            u = sampling.uniforms_b(trace_keys, 5, domain=i)
            unit_sample = sampling.unit_vector_from_uniforms(u[:, 0:4])
            new_dir, mat_atten, ok = scatter_sampled(
                rec, d, unit_sample, u[:, 4]
            )
            # v2 dielectric override (no Schlick — the modern path's
            # reflectance branch never fires), always scatters.
            unit_in = vm.unit_vector(d)
            ratio = jnp.where(rec.front_face, 1.0 / rec.ior, rec.ior)
            cos_t = jnp.minimum(vm.dot(-unit_in, rec.normal), 1.0)
            r_perp = ratio[:, None] * (unit_in + cos_t[:, None] * rec.normal)
            k = 1.0 - jnp.sum(r_perp * r_perp, axis=-1, keepdims=True)
            if mode == "always_refract":
                # fabs, not clamp: beyond-critical lanes get the bogus
                # direction the listing's refract produced
                # (archive/listing53/vec3.h:129).
                diel_dir = r_perp - jnp.sqrt(jnp.abs(k)) * rec.normal
            else:  # tir_reflect (archive/listing58/material.h:66-72)
                refr = r_perp - jnp.sqrt(jnp.maximum(k, 0.0)) * rec.normal
                sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                tir = (ratio * sin_t > 1.0)[:, None]
                diel_dir = jnp.where(
                    tir, vm.reflect(unit_in, rec.normal), refr
                )
            is_diel = rec.mat_type == DIEL
            new_dir = jnp.where(is_diel[:, None], diel_dir, new_dir)
            ok = jnp.where(is_diel, True, ok)
            cont = alive & rec.hit & ok
            atten = jnp.where(cont[:, None], atten * mat_atten, atten)
            o = jnp.where(cont[:, None], rec.point, o)
            d = jnp.where(cont[:, None], new_dir, d)
            return o, d, atten, radiance, cont

        _, _, _, radiance, _ = jax.lax.fori_loop(
            0, max_depth, bounce,
            (o, d, jnp.ones((n, 3)), jnp.zeros((n, 3)), jnp.ones(n, bool)),
        )
        return acc + radiance

    total = jax.lax.fori_loop(
        0, spp, sample_body, jnp.zeros((w * h, 3), jnp.float32)
    )
    return (total / spp).reshape(h, w, 3)


def render_normals(
    scene: Scene, cam: Camera, base_key: jax.Array, spp: int = 4
) -> jnp.ndarray:
    """Normals-colored shading: 0.5 * (n + 1) on hit, sky otherwise —
    the book's first shading model (reference:
    archive/listing24/main.cc ray_color; gallery/cpu/image5 renders it
    over the sphere+ground world). NOTE the listing writes colors with
    the PRE-gamma write_color (sqrt lands at archive/listing35/color.h),
    so parity comparisons must quantize linearly. Returns [H, W, 3]
    linear radiance."""
    w, h = cam.image_width, cam.image_height
    pix = jnp.arange(w * h)
    px, py = pix % w, pix // w
    pixel_keys = sampling.fold_b(jnp.broadcast_to(base_key, pix.shape), pix)

    def sample_body(s, acc):
        keys = sampling.fold_b(pixel_keys, s)
        o, d = get_rays(cam, px, py, sampling.fold_b(keys, 0))
        # The normals listing probes with t_min = 0, not the
        # shadow-acne epsilon (reference: archive/listing24/main.cc):
        # primary rays only, so the distinction is cosmetic here.
        rec = hit_scene(scene, o, d)
        n_col = 0.5 * (rec.normal + 1.0)
        sky = sky_color(vm.unit_vector(d))
        return acc + jnp.where(rec.hit[:, None], n_col, sky)

    total = jax.lax.fori_loop(
        0, spp, sample_body, jnp.zeros((w * h, 3), jnp.float32)
    )
    return (total / spp).reshape(h, w, 3)


def render_hemisphere_diffuse(
    scene: Scene, cam: Camera, base_key: jax.Array,
    spp: int = 16, max_depth: int = 50,
) -> jnp.ndarray:
    """The book's interim hemisphere-diffuse model: on hit, scatter
    uniformly on the normal's hemisphere and attenuate by 0.5
    (reference: archive/listing40/main.cc ray_color +
    archive/listing39/vec3.h:110-116 random_in_hemisphere). The GPU
    tree keeps `random_on_hemisphere` defined-but-unused
    (reference: src/gpu/rtweekend.h:55-59); this renderer is the
    milestone it belonged to. Direction law: uniform-in-ball flipped to
    the hemisphere has a uniform-on-hemisphere direction marginal, so
    the closed-form hemisphere sampler below is equal in law (the
    ray only uses the direction; ops/sampling.py documents the same
    argument for the sphere samplers). Returns [H, W, 3] linear
    radiance (gamma applies downstream; sqrt exists by this listing)."""
    w, h = cam.image_width, cam.image_height
    pix = jnp.arange(w * h)
    px, py = pix % w, pix // w
    pixel_keys = sampling.fold_b(jnp.broadcast_to(base_key, pix.shape), pix)

    def sample_body(s, acc):
        keys = sampling.fold_b(pixel_keys, s)
        o, d = get_rays(cam, px, py, sampling.fold_b(keys, 0))
        bounce_base = sampling.fold_b(keys, 1)

        def bounce(i, carry):
            o, d, atten, radiance, alive = carry
            rec = hit_scene(scene, o, d)
            sky = sky_color(vm.unit_vector(d))
            miss = alive & ~rec.hit
            radiance = radiance + jnp.where(
                miss[:, None], atten[:, None] * sky, 0.0
            )
            # Uniform hemisphere direction about the normal.
            u = sampling.unit_vector_b(sampling.fold_b(bounce_base, i))
            flip = vm.dot(u, rec.normal) < 0.0
            hemi = jnp.where(flip[:, None], -u, u)
            cont = alive & rec.hit
            o = jnp.where(cont[:, None], rec.point, o)
            d = jnp.where(cont[:, None], hemi, d)
            atten = jnp.where(cont, atten * 0.5, atten)
            return o, d, atten, radiance, cont

        n = pix.shape[0]
        _, _, _, radiance, _ = jax.lax.fori_loop(
            0, max_depth, bounce,
            (o, d, jnp.ones(n), jnp.zeros((n, 3)), jnp.ones(n, bool)),
        )
        return acc + radiance

    total = jax.lax.fori_loop(
        0, spp, sample_body, jnp.zeros((w * h, 3), jnp.float32)
    )
    return (total / spp).reshape(h, w, 3)
