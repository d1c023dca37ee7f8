"""End-to-end drives of the CLI script surfaces (scripts/*.py) the way a
user runs them — argv in, files/JSON out. Uses the shipped synthetic-data
config so everything runs on the virtual CPU mesh."""
import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run_script(name: str, argv, capsys=None):
    spec = importlib.util.spec_from_file_location(name,
                                                  ROOT / "scripts" / name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [name] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def test_evaluate_script_end_to_end(capsys, monkeypatch):
    monkeypatch.chdir(ROOT)
    _run_script("evaluate.py",
                ["-c", "fake_vitvq_tiny", "--max-batches", "2"])
    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert result["num_images"] == 16
    assert np.isfinite(result["psnr"]) and np.isfinite(result["ssim"])
    assert 0.0 < result["codebook_usage"] <= 1.0
    assert np.isfinite(result["vgg_frechet_distance"])


def test_reconstruct_script_end_to_end(tmp_path, monkeypatch, rng):
    from PIL import Image

    monkeypatch.chdir(ROOT)
    imgs = []
    for i in range(2):
        p = tmp_path / f"in{i}.png"
        Image.fromarray((rng.random((48, 48, 3)) * 255).astype(
            np.uint8)).save(p)
        imgs.append(str(p))
    _run_script("reconstruct.py",
                ["-c", "fake_vitvq_tiny", *imgs, "-o",
                 str(tmp_path / "out")])
    outs = sorted((tmp_path / "out").iterdir())
    assert any(p.suffix == ".png" for p in outs)
    assert any(p.suffix == ".npy" for p in outs)
    codes = np.load([p for p in outs if p.suffix == ".npy"][0])
    assert codes.shape[0] == 2


def test_export_script_end_to_end(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(ROOT)
    _run_script("export.py", ["-c", "fake_vitvq_tiny", "-b", "2",
                              "-o", str(tmp_path)])
    out = capsys.readouterr().out
    assert "encode" in out and "decode" in out
    from enhancing_tpu.utils.export import load_artifact

    enc = load_artifact(tmp_path / "tokenizer_encode.jaxexport")
    import jax.numpy as jnp

    codes = enc(jnp.zeros((2, 32, 32, 3), jnp.float32))
    assert codes.shape[0] == 2


def test_main_cli_stage2_with_parallel_flags(tmp_path, monkeypatch):
    """main.py trains the synthetic stage-2 config end-to-end with
    tp + sequence-parallel + ZeRO-1 flags on the virtual mesh."""
    monkeypatch.chdir(ROOT)
    spec = importlib.util.spec_from_file_location("main_cli", ROOT / "main.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["main.py", "-c", "fake_gpt_tiny", "-e", "1",
                "--max_steps", "2", "-mp", "2", "--sp", "--zero1",
                "--run_dir", str(tmp_path / "run")]
    try:
        mod.main()
    finally:
        sys.argv = old
    assert (tmp_path / "run" / "ckpt").is_dir()


def test_main_cli_stage2_pipeline_parallel(tmp_path, monkeypatch):
    """main.py -pp 2: GPipe pipeline training through the CLI."""
    monkeypatch.chdir(ROOT)
    spec = importlib.util.spec_from_file_location("main_cli2",
                                                  ROOT / "main.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["main.py", "-c", "fake_gpt_tiny", "-e", "1",
                "--max_steps", "2", "-pp", "2", "--microbatches", "2",
                "--run_dir", str(tmp_path / "run")]
    try:
        mod.main()
    finally:
        sys.argv = old
    assert (tmp_path / "run" / "ckpt").is_dir()


def test_eval_samples_script_end_to_end(capsys, monkeypatch):
    """scripts/eval_samples.py: full conditional sampling + Frechet vs
    dataset images on the synthetic stage-2 config."""
    monkeypatch.chdir(ROOT)
    _run_script("eval_samples.py",
                ["-c", "fake_gpt_tiny", "--num_samples", "8",
                 "--batch", "8", "--top_k", "8"])
    out = capsys.readouterr().out
    result = json.loads(out[out.index("{"):])
    assert result["num_samples"] == 8
    assert np.isfinite(result["frechet_distance"])
