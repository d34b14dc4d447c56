#!/usr/bin/env python
"""Collect the round-5 production-CLI jigsaw legs into one artifact.

Legs (all b=128, q=4096, 4-frame multi-pair, bf16, 500 iters/epoch,
SyntheticVideoDataset(256) — the config whose plain-path trajectory is
0.046 → 0.887 over 10 epochs and whose --jigsaw-sides both trajectory is
0.594 → 0.818 over 8 epochs):

  jigsaw_alt_cli          reference-parity 50/50 alternation (control)
  jigsaw_warmup_cli       warmup 1500 both-sides → alternation
  jigsaw_warmup_late_cli  warmup 3000 (handoff at decayed LR)
  jigsaw_warmup_lowlr_cli warmup 1500, base-lr 0.01
  jigsaw_warmup_mix_cli   warmup 3000 MIXED (plain/both 50/50) → alternation

Usage: python tools/collect_jigsaw_cli.py --logdir /tmp/chip_r5c \
           --out docs/jigsaw_production_cli_r5.json
"""

import argparse
import ast
import json
import os
import re

LEGS = {
    "alternation_control": ("jigsaw_alt_cli", "--jigsaw (reference parity)"),
    "warmup1500": ("jigsaw_warmup_cli", "--jigsaw-warmup-steps 1500"),
    "warmup3000_late_handoff": (
        "jigsaw_warmup_late_cli", "--jigsaw-warmup-steps 3000"),
    "warmup1500_lowlr": (
        "jigsaw_warmup_lowlr_cli", "--jigsaw-warmup-steps 1500 --base-lr 0.01"),
    "warmup3000_mixed": (
        "jigsaw_warmup_mix_cli",
        "--jigsaw-warmup-steps 3000 --jigsaw-warmup-mix"),
    "warmup3000_mixed_16ep": (
        "jigsaw_warmup_mix16_cli",
        "--jigsaw-warmup-steps 3000 --jigsaw-warmup-mix --epochs 16"),
    "warmup3000_mixed_align1": (
        "jigsaw_warmup_mix_align_cli",
        "--jigsaw-warmup-steps 3000 --jigsaw-warmup-mix "
        "--jigsaw-align-weight 1.0"),
}


def parse_log(path):
    vals = []
    with open(path) as f:
        for line in f:
            m = re.match(r"^val(?: \([^)]*\))?: (\{.*\})\s*$", line)
            if m:
                try:
                    vals.append(ast.literal_eval(m.group(1)))
                except (ValueError, SyntaxError):
                    pass
    return {
        "val_nce_accuracy": [v.get("nce_accuracy") for v in vals],
        "val_nce_loss": [v.get("loss/nce_loss") for v in vals],
        "n_epochs": len(vals),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/chip_r5c")
    ap.add_argument("--out", default="docs/jigsaw_production_cli_r5.json")
    args = ap.parse_args()

    doc = {
        "experiment": "Jigsaw alternation remedies at the PRODUCTION config "
                      "through the real CLI (solver_runner.py): R18 b=128 "
                      "q=4096 4-frame bf16, 500 iters/epoch",
        "anchors": {
            "plain_path": "0.046 -> 0.887 over 10 epochs (STATUS round-1)",
            "jigsaw_sides_both": "0.594 -> 0.818 over 8 epochs "
                                  "(docs/jigsaw_both_cli_r4.json)",
            "chance_vs_bank": round(1.0 / (128 + 4096), 5),
        },
        "legs": {},
    }
    for key, (name, flags) in LEGS.items():
        path = os.path.join(args.logdir, f"{name}.log")
        if os.path.exists(path):
            doc["legs"][key] = {"flags": flags, **parse_log(path)}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    for k, v in doc["legs"].items():
        print(k, v["val_nce_accuracy"])
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
