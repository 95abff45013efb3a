from ray_tracing_in_one_weekend_tpu.parallel.dist import (
    PIXEL_AXIS,
    SAMPLE_AXIS,
    make_mesh,
    render_distributed,
    render_grads,
    render_image_distributed,
    render_loss,
    scene_params,
    scene_with_params,
    train_step,
)

__all__ = [
    "PIXEL_AXIS",
    "SAMPLE_AXIS",
    "make_mesh",
    "render_distributed",
    "render_grads",
    "render_image_distributed",
    "render_loss",
    "scene_params",
    "scene_with_params",
    "train_step",
]
