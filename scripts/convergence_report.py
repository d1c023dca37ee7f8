#!/usr/bin/env python3
"""Summarize a training run's metrics.jsonl into convergence evidence
(VERDICT r4 #6): did the recon loss decrease monotone-ish, did codebook
usage rise, did the GAN logits stay bounded?

Reads <run_dir>/metrics.jsonl (written by utils.logging.JsonlLogger on
every --log_every step), prints a trajectory table, and appends a
``convergence`` row per tracked metric to BENCH_EXTENDED.json with the
first/last window means.

Usage: python scripts/convergence_report.py <run_dir> [--window 5]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TRACKED = ["train/rec_loss", "train/loggaussian_loss", "train/total_loss",
           "train/code_perplexity", "train/disc_loss", "train/g_loss"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--window", type=int, default=5,
                    help="rows averaged at each end of the trajectory")
    ap.add_argument("--record", action="store_true",
                    help="append convergence rows to BENCH_EXTENDED.json")
    args = ap.parse_args()

    path = Path(args.run_dir) / "metrics.jsonl"
    rows = [json.loads(line) for line in open(path)]
    rows = [r for r in rows if "train/total_loss" in r]
    if len(rows) < 2 * args.window:
        sys.exit(f"only {len(rows)} train rows in {path} — nothing to judge")

    print(f"{len(rows)} logged train steps "
          f"(step {rows[0]['step']}..{rows[-1]['step']})")
    w = args.window
    summary = {}
    for key in TRACKED:
        vals = [r[key] for r in rows if key in r]
        if not vals:
            continue
        first = sum(vals[:w]) / w
        last = sum(vals[-w:]) / w
        lo, hi = min(vals), max(vals)
        summary[key] = (first, last, lo, hi)
        print(f"  {key:26s} first~{first:9.4f} -> last~{last:9.4f} "
              f"(min {lo:9.4f} max {hi:9.4f})")

    rec_first, rec_last = summary["train/rec_loss"][:2]
    perp = summary.get("train/code_perplexity")
    ok_rec = rec_last < rec_first
    print(f"\nrecon loss decreased: {ok_rec} "
          f"({rec_first:.4f} -> {rec_last:.4f}, "
          f"{(1 - rec_last / rec_first) * 100:.1f}% drop)")
    if perp:
        print(f"code perplexity: {perp[0]:.1f} -> {perp[1]:.1f} "
              f"(max {perp[3]:.1f} of the codebook)")

    if args.record:
        from enhancing_tpu.utils.bench_log import record
        for key, (first, last, lo, hi) in summary.items():
            if min(first, last) < 0:   # GAN logits/losses may be negative
                continue
            record("convergence", last, key.split("/")[-1],
                   first=round(first, 4), steps=rows[-1]["step"],
                   run=str(Path(args.run_dir).name))
    return 0 if ok_rec else 1


if __name__ == "__main__":
    sys.exit(main())
