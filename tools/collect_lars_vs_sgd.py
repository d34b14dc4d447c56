#!/usr/bin/env python
"""Collect the LARS-vs-SGD chip legs (tools/chip_session_r5.sh §4) into one
artifact (VERDICT r4 item 3: '--optimizer lars' shipped with a unit test but
no convergence evidence).

Parses the two solver_runner logs' per-epoch ``val: {...}`` lines and the
train-log accuracy prints into curves, and writes
``docs/lars_vs_sgd_r5.json`` with both trajectories side by side plus the
recommendation block (filled from the measured curves).

    python tools/collect_lars_vs_sgd.py --sgd /tmp/chip_r5/soak_sgd_3ep.log \
        --lars /tmp/chip_r5/soak_lars_3ep.log --out docs/lars_vs_sgd_r5.json
"""

import argparse
import ast
import json
import re


def parse_log(path):
    """Extract per-epoch val metric dicts and any train-accuracy prints."""
    vals = []
    train = []
    lr = None
    with open(path) as f:
        for line in f:
            m = re.match(r"^val(?: \([^)]*\))?: (\{.*\})\s*$", line)
            if m:
                try:
                    vals.append(ast.literal_eval(m.group(1)))
                except (ValueError, SyntaxError):
                    pass
            m = re.search(r"nce_accuracy[\"']?[:=]? ?([0-9.]+)", line)
            if m and "val" not in line:
                try:
                    train.append(float(m.group(1)))
                except ValueError:
                    pass
            m = re.search(r"Learning rate ([0-9.e-]+)", line)
            if m and lr is None:
                lr = float(m.group(1))
    return {
        "val_nce_accuracy": [v.get("nce_accuracy") for v in vals],
        "val_nce_loss": [v.get("loss/nce_loss") for v in vals],
        "val_cosine_sim": [v.get("cosine_sim") for v in vals],
        "first_lr": lr,
        "n_epochs": len(vals),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sgd", required=True)
    ap.add_argument("--lars", required=True)
    ap.add_argument("--out", default="docs/lars_vs_sgd_r5.json")
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    sgd = parse_log(args.sgd)
    lars = parse_log(args.lars)
    doc = {
        "experiment": "LARS vs SGD on the pinned synthetic-video task "
                      "(tools/chip_session_r5.sh §4; 3 epochs x 500 steps, "
                      "ResNet18 b=128 @64^2, q=4096, bf16)",
        "sgd": {"base_lr": 0.03, **sgd},
        "lars": {"base_lr": 0.15,
                 "lr_rule": "0.3 * batch/256 (SimCLR linear scaling)",
                 **lars},
        "note": args.note,
    }
    s_acc = [a for a in sgd["val_nce_accuracy"] if a is not None]
    l_acc = [a for a in lars["val_nce_accuracy"] if a is not None]
    if s_acc and l_acc:
        doc["summary"] = {
            "sgd_final_val_acc": s_acc[-1],
            "lars_final_val_acc": l_acc[-1],
            "verdict": ("lars_ahead" if l_acc[-1] > s_acc[-1] + 0.02 else
                        "sgd_ahead" if s_acc[-1] > l_acc[-1] + 0.02 else
                        "comparable"),
        }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc.get("summary", doc), indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
