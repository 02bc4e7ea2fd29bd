"""CLI smoke tests — the application layer (reference Application.js +
dialogs analog). Runs in-process on the forced-CPU test backend."""

import json
import os

import numpy as np
import pytest

from vpt_tpu.cli import main


def _run(capsys, argv):
    main(argv)
    return capsys.readouterr()


def test_renderers_and_tonemappers_lists(capsys):
    out = _run(capsys, ["renderers"]).out
    for key in ("mcm-spectral", "mcm", "mcs", "eam", "mip", "iso", "depth",
                "dos", "lao"):
        assert key in out
    out = _run(capsys, ["tonemappers"]).out
    for key in ("artistic", "reinhard", "aces", "uchimura", "lottes"):
        assert key in out


def test_render_to_png_and_checkpoint(tmp_path, capsys):
    png = str(tmp_path / "out.png")
    ck = str(tmp_path / "state.npz")
    res = _run(capsys, [
        "render", "--volume", "sphere_in_cube", "--volume-size", "16",
        "--resolution", "16", "--frames", "2", "--steps", "4",
        "--output", png, "--checkpoint", ck,
    ])
    assert os.path.exists(png) and os.path.exists(ck)
    metrics = json.loads(res.out.strip().splitlines()[-1])
    assert metrics["frames"] == 2


def test_render_each_renderer(tmp_path, capsys):
    for key in ("eam", "mip", "mcm"):
        png = str(tmp_path / f"{key}.png")
        _run(capsys, [
            "render", "--renderer", key, "--volume-size", "16",
            "--resolution", "16", "--frames", "2", "--steps", "4",
            "--output", png,
        ])
        assert os.path.exists(png)


def test_render_spectral_compaction(tmp_path, capsys):
    png = str(tmp_path / "compact.png")
    _run(capsys, [
        "render", "--volume", "sphere_in_cube", "--volume-size", "16",
        "--resolution", "16", "--frames", "2", "--steps", "4",
        "--compaction", "--output", png,
    ])
    assert os.path.exists(png)


def test_render_spectral_with_envmap(tmp_path, capsys):
    env = str(tmp_path / "env.npy")
    np.save(env, np.ones((4, 8, 3), np.float32))
    png = str(tmp_path / "env_render.png")
    _run(capsys, [
        "render", "--volume-size", "16", "--resolution", "16",
        "--frames", "2", "--steps", "4", "--envmap", env, "--output", png,
    ])
    assert os.path.exists(png)


def test_animate(tmp_path, capsys):
    outdir = str(tmp_path / "anim")
    _run(capsys, [
        "animate", "--volume-size", "16", "--resolution", "16",
        "--frames", "1", "--steps", "4", "--n-frames", "2",
        "--output", outdir,
    ])
    files = sorted(os.listdir(outdir))
    assert len(files) == 2


def test_invert_spectral_importance_mode(tmp_path, capsys):
    """The invert subcommand's r5 estimator flags plumb end-to-end: a forced
    integer stride with --scatter-mode importance runs the importance-thinned
    packed-PRB estimator (optim.fit_spectral scatter_mode) and writes the
    recovered grid + JSON metrics."""
    out = str(tmp_path / "rec.npy")
    captured = _run(capsys, [
        "invert", "--spectral", "--volume-size", "16", "--resolution", "16",
        "--iterations", "2", "--method", "prb", "--scatter-stride", "2",
        "--scatter-mode", "importance", "--output", out,
    ])
    assert os.path.exists(out)
    metrics = json.loads(captured.out.strip().splitlines()[-1])
    assert np.isfinite(metrics["final_loss"])
    assert np.isfinite(metrics["density_mae"])
    assert np.load(out).shape == (16, 16, 16)
