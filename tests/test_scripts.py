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


def _synth_vitvq_ckpt(tmp_path):
    """Tiny reference-layout torch ViT-VQ checkpoint (test_compat's model)."""
    import torch
    from test_compat import TorchViTVQ

    torch.manual_seed(0)
    tmodel = TorchViTVQ().eval()
    path = tmp_path / "synth_vitvq.ckpt"
    torch.save({"state_dict": tmodel.state_dict()}, path)
    return path


def _synth_val_dir(tmp_path, n=6, res=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path / "val"
    d.mkdir()
    for i in range(n):
        img = (rng.random((res, res, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"img_{i}.png")
    return d


def _tiny_parity_config(tmp_path):
    cfg = tmp_path / "tiny_parity.yaml"
    cfg.write_text("""
model:
    target: enhancing_tpu.models.stage1.vitvqgan.ViTVQ
    params:
        image_size: 32
        patch_size: 8
        encoder: {dim: 64, depth: 2, heads: 2, mlp_dim: 128}
        decoder: {dim: 64, depth: 2, heads: 2, mlp_dim: 128}
        quantizer: {embed_dim: 16, n_embed: 64}
""")
    return cfg


def _synth_lpips_ckpt(tmp_path):
    """torchvision-vgg16 + lpips-package key layout with random weights
    (the loader itself is golden-tested in test_losses)."""
    import torch
    import torch.nn as tnn

    torch.manual_seed(0)
    plan = [(3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
            (128, 256), (256, 256), (256, 256), "M",
            (256, 512), (512, 512), (512, 512), "M",
            (512, 512), (512, 512), (512, 512), "M"]
    layers = []
    for p in plan:
        if p == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(p[0], p[1], 3, padding=1))
            layers.append(tnn.ReLU())
    features = tnn.Sequential(*layers).eval()
    with torch.no_grad():
        for m in features:
            if isinstance(m, tnn.Conv2d):
                m.weight.mul_(0.05)
                m.bias.mul_(0.05)
    sd = {f"features.{i}.{p}": t.detach().clone()
          for i, m in enumerate(features) if isinstance(m, tnn.Conv2d)
          for p, t in (("weight", m.weight), ("bias", m.bias))}
    sd.update({f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1) * 0.1
               for i, c in enumerate((64, 128, 256, 512, 512))})
    path = tmp_path / "synth_lpips.pth"
    import torch as _t
    _t.save(sd, path)
    return path


def test_parity_report_end_to_end(tmp_path, capsys, monkeypatch):
    """North-star dress rehearsal (VERDICT r2 item #6): synthesized HF-layout
    weights -> encode/decode a val folder -> PSNR/SSIM/codebook JSON."""
    monkeypatch.chdir(ROOT)
    ckpt = _synth_vitvq_ckpt(tmp_path)
    val = _synth_val_dir(tmp_path)
    out = tmp_path / "report.json"
    _run_script("parity_report.py", [
        "--hf_ckpt", str(ckpt), "--val_dir", str(val),
        "-c", str(_tiny_parity_config(tmp_path)),
        "--resolution", "32", "--batch-size", "4", "--int8",
        "-o", str(out)])
    rep = json.loads(out.read_text())
    assert rep["n_images"] == 6
    assert np.isfinite(rep["psnr"]) and 0 < rep["ssim"] <= 1
    assert rep["codebook"]["usage"] >= 0
    assert rep["rfid"] is None and "note" in rep
    # --int8: the W8A8 numerics gate rides the same report
    q8 = rep["int8_w8a8"]
    assert 0 <= q8["code_match_vs_bf16"] <= 1
    assert np.isfinite(q8["psnr"]) and 0 < q8["ssim"] <= 1


def test_parity_report_vgg_frechet(tmp_path, capsys, monkeypatch):
    """--vgg path: synthesized LPIPS/VGG weights give a finite VGG-Fréchet."""
    monkeypatch.chdir(ROOT)
    ckpt = _synth_vitvq_ckpt(tmp_path)
    val = _synth_val_dir(tmp_path, n=4)
    out = tmp_path / "report.json"
    _run_script("parity_report.py", [
        "--hf_ckpt", str(ckpt), "--val_dir", str(val),
        "-c", str(_tiny_parity_config(tmp_path)),
        "--vgg", str(_synth_lpips_ckpt(tmp_path)),
        "--resolution", "32", "--batch-size", "4", "-o", str(out)])
    rep = json.loads(out.read_text())
    assert np.isfinite(rep["vgg_frechet"]) and rep["vgg_frechet"] >= 0


def test_parity_report_synth_inception_rfid(tmp_path, capsys, monkeypatch):
    """--inception path: synthesized FID-layout InceptionV3 weights load and
    give a finite rFID (the loader is golden-tested in test_inception)."""
    import torch
    from test_inception import TInception

    monkeypatch.chdir(ROOT)
    torch.manual_seed(0)
    tm = TInception().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.mul_(0.1)
    ipath = tmp_path / "synth_inception.pth"
    torch.save(tm.state_dict(), ipath)
    ckpt = _synth_vitvq_ckpt(tmp_path)
    val = _synth_val_dir(tmp_path, n=4)
    out = tmp_path / "report.json"
    _run_script("parity_report.py", [
        "--hf_ckpt", str(ckpt), "--val_dir", str(val),
        "-c", str(_tiny_parity_config(tmp_path)),
        "--inception", str(ipath),
        "--resolution", "32", "--batch-size", "4", "-o", str(out)])
    rep = json.loads(out.read_text())
    assert np.isfinite(rep["rfid"]) and rep["rfid"] >= 0
