"""Config presets reproduce the reference variants' hard-coded values."""

import math

import numpy as np

from ray_tracing_in_one_weekend_tpu.utils.cli import build_parser, config_from_args
from ray_tracing_in_one_weekend_tpu.utils.config import (
    PRESETS,
    make_camera_from_config,
)


def test_cpu_preset_uses_reference_aperture():
    """The CPU tree's lens is aperture 0.1 (reference: src/cpu/main.cc:96,
    src/cpu/camera.h:20-26), not the GPU tree's 0.6-degree defocus angle.
    The preset must reproduce the CPU framing exactly."""
    config = PRESETS["cpu"]
    assert config.aperture == 0.1
    cam = make_camera_from_config(config)
    # lens radius = aperture/2 -> |defocus_disk_u| = 0.05
    assert np.isclose(float(np.linalg.norm(cam.defocus_disk_u)), 0.05, rtol=1e-6)
    # equivalent defocus angle = 2*atan(0.05/10) ~= 0.573 deg
    expected_deg = 2.0 * math.degrees(math.atan(0.005))
    assert np.isclose(float(cam.defocus_angle), expected_deg, rtol=1e-6)


def test_gpu_preset_uses_defocus_angle():
    """GPU tree: defocus_angle 0.6 deg (reference: src/gpu/camera.h:69)."""
    config = PRESETS["gpu"]
    assert config.aperture is None
    cam = make_camera_from_config(config)
    assert np.isclose(float(cam.defocus_angle), 0.6)


def test_cli_aperture_flag():
    args = build_parser().parse_args(["--aperture", "0.2", "--width", "100"])
    config = config_from_args(args)
    assert config.aperture == 0.2
    cam = make_camera_from_config(config)
    assert np.isclose(float(np.linalg.norm(cam.defocus_disk_u)), 0.1, rtol=1e-6)


def test_cli_progress_path_rounds_batch_to_sample_shards(capsys):
    """Long renders route through the sample-batched progress path,
    whose per-batch spp must divide the sample-shard axis — the CLI
    rounds the batch to a multiple (review finding r4: a gpu-preset
    render on a sample-sharded mesh crashed on its first batch)."""
    import sys

    from ray_tracing_in_one_weekend_tpu.utils import cli

    rc = cli.main([
        "--platform", "cpu", "--mesh", "1,4", "--width", "32",
        "--spp", "64", "--spp-batch", "10", "--scene", "single",
        "--max-depth", "4", "--no-output",
    ])
    assert rc == 0
    err = capsys.readouterr().err
    # 10 rounds down to 8 (multiple of the 4 sample shards).
    assert "(+8 in" in err
    assert "samples 64/64" in err


def test_cli_resumed_complete_checkpoint_writes_output(tmp_path, capsys):
    """Re-running with an already-complete checkpoint must export the
    image without dividing by the zero seconds of this session's render
    (review finding r4)."""
    from ray_tracing_in_one_weekend_tpu.utils import cli

    ck = str(tmp_path / "c.npz")
    out = str(tmp_path / "o.ppm")
    args = ["--platform", "cpu", "--width", "24", "--spp", "4",
            "--scene", "single", "--max-depth", "3",
            "--checkpoint", ck, "--out", out]
    assert cli.main(args) == 0
    first = open(out, "rb").read()
    assert cli.main(args) == 0
    assert open(out, "rb").read() == first
    assert "already complete" in capsys.readouterr().err


def test_cli_cold_flag_renders_identically(capsys):
    """`--cold` disables warm-start scheduling; the image must be
    byte-identical to the default warm render (the bit-identity
    contract of ops/pallas_render's schedule cache, via the CLI)."""
    from ray_tracing_in_one_weekend_tpu.utils import cli

    base = ["--scene", "three", "--width", "32", "--aspect", "2.0",
            "--spp", "2", "--max-depth", "4", "--backend", "pallas",
            "--tile", "128"]
    assert cli.main(base + ["--cold"]) == 0
    cold_out = capsys.readouterr().out
    assert cli.main(base) == 0  # warm fill
    assert cli.main(base) == 0  # warm hit
    warm_out = capsys.readouterr().out
    # two renders captured; both must equal the cold PPM
    assert warm_out == cold_out + cold_out
