import sys, time
import jax
import jax.numpy as jnp

from ray_tracing_in_one_weekend_tpu.models.scene import cover_scene
from ray_tracing_in_one_weekend_tpu.utils.config import PRESETS, make_camera_from_config
from ray_tracing_in_one_weekend_tpu.ops.pallas_render import render_pallas
from ray_tracing_in_one_weekend_tpu.ops.pallas_grad import (
    render_pallas_diff, DIFF_FIELDS,
)

cfg = PRESETS["bench"]
scene = cover_scene(cfg.seed)
cam = make_camera_from_config(cfg)
rays = cfg.rays_per_frame
print("dev:", jax.devices()[0], file=sys.stderr)

def timeit(label, run, n=3):
    t0 = time.perf_counter(); run(0); c = time.perf_counter() - t0
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter(); run(i); ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label}: compile {c:.1f}s best {t:.3f}s ({rays/t/1e6:.1f} Mrays/s)")
    return t

def run_fwd(i):
    img = render_pallas(scene, cam, seed=i)
    return float(jnp.sum(img))

timeit("forward", run_fwd)

params = {k: getattr(scene, k) for k in DIFF_FIELDS}
target = jnp.zeros((cam.image_height, cam.image_width, 3), jnp.float32)

def loss(p, seed):
    img = render_pallas_diff(scene.replace(**p), cam, seed=seed)
    return jnp.mean((img - target) ** 2)

grad_fn = jax.jit(jax.value_and_grad(loss), static_argnums=(1,))

def run_fb(i):
    l, g = grad_fn(params, i)
    s = float(l) + float(jnp.sum(g["center"]))
    return s

timeit("forward+backward", run_fb)
