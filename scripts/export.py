"""Export trained models to portable StableHLO serving artifacts.

Usage:
    python scripts/export.py -c imagenet_vitvq_base -o artifacts/ -b 8 \
        [--ckpt path.ckpt] [--platforms tpu cpu] [--top_k 300]

Stage-1 configs export the tokenizer (encode/decode/reconstruct); stage-2
configs export the end-to-end conditional sampler. Artifacts load with
``enhancing_tpu.utils.export.load_artifact`` — no model code needed.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-o", "--outdir", default="artifacts")
    p.add_argument("-b", "--batch", type=int, default=8)
    p.add_argument("--ckpt", default=None,
                   help="torch/orbax checkpoint to load before export")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms, e.g. --platforms tpu cpu")
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--int8", action="store_true",
                   help="stage-1: trace the tokenizer with the W8A8 GEMM "
                        "mode (ops/int8.w8a8_gemms — block GEMMs on the "
                        "MXU's native int8 path); numerics gate: "
                        "scripts/bench_int8_stage1.py")
    args = p.parse_args()

    from enhancing_tpu.models.stage2.transformer import CondTransformer
    from enhancing_tpu.utils import (get_config_from_file,
                                     initialize_from_config)
    from enhancing_tpu.utils.export import export_sampler, export_tokenizer

    cfg = get_config_from_file(Path("configs") / f"{args.config}.yaml")
    model = initialize_from_config(cfg.model)
    if args.ckpt:
        model.init_from_ckpt(args.ckpt)

    if isinstance(model, CondTransformer):
        paths = export_sampler(model, args.batch, args.outdir,
                               top_k=args.top_k, top_p=args.top_p,
                               temperature=args.temperature,
                               platforms=args.platforms)
    else:
        import contextlib

        from enhancing_tpu.ops.int8 import w8a8_gemms
        ctx = w8a8_gemms() if args.int8 else contextlib.nullcontext()
        with ctx:  # trace-time switch: baked into the exported program
            paths = export_tokenizer(model, args.batch, args.outdir,
                                     platforms=args.platforms)
    for name, path in paths.items():
        print(f"{name}: {path} ({Path(path).stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
