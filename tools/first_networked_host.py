#!/usr/bin/env python
"""First-networked-host acceptance run — the executable form of
``docs/NETWORKED_TODO.md`` items 1–3 (VERDICT r4 item 8).

Runs, in order:

1. **Released-weight pipeline** — fetch the published VINCE ResNet18 weights
   (reference ``download_scripts/download_pretrained_weights_resnet18.sh``),
   convert torch→Orbax, and (when ``--imagenet-data-path`` points at real
   ImageNet) run the linear-probe eval and check top-1 against the reference
   table (``/root/reference/README.md:103-116``: 0.400 ± 0.005).
2. **torchvision ColorJitter parity** — ``pip install torchvision`` if absent,
   then ``tools/check_colorjitter_vs_torchvision.py`` (exit 0 = parity).
3. **R2V2 shard download** — one shard from
   ``vince_tpu/info_files/r2v2_drive_urls.txt`` through the Drive confirm
   flow; accepts when frames land in the reference layout.

Every step records PASS / FAIL / BLOCKED_OFFLINE / SKIPPED_NO_DATA with
detail into a machine-readable JSON report (``--report``, default
``first_networked_report.json``). Offline (no egress) the script still
executes each leg to its first network call — proving the wiring runs —
records BLOCKED_OFFLINE, and exits 0. Any FAIL exits 1.

Offline dry-run (what the build sandbox can verify):

    python tools/first_networked_host.py --report /tmp/report.json
"""

import argparse
import datetime
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference README.md:103-116 acceptance numbers (VINCE ResNet18)
REFERENCE_IMAGENET_TOP1 = 0.400
IMAGENET_TOL = 0.005


def have_egress(timeout: float = 10.0) -> bool:
    for url in ("https://www.google.com", "https://drive.google.com"):
        try:
            urllib.request.urlopen(url, timeout=timeout)
            return True
        except OSError:
            continue
    return False


def run(cmd, timeout=None, env=None, cwd=REPO):
    """Run a subprocess; returns (rc, combined tail of output)."""
    try:
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, env=env,
            cwd=cwd,
        )
        out = (res.stdout or "") + (res.stderr or "")
        return res.returncode, out
    except subprocess.TimeoutExpired as e:
        out = ""
        for s in (e.stdout, e.stderr):
            if s:
                out += s if isinstance(s, str) else s.decode(errors="replace")
        return -1, out + f"\n[timeout after {timeout}s]"


def offline_status(output: str) -> str:
    """A network-shaped failure is BLOCKED_OFFLINE, anything else FAIL."""
    markers = ("offline environment", "urlopen error", "Name or service",
               "Temporary failure in name resolution", "Connection refused",
               "Network is unreachable", "timed out", "TimeoutError")
    return ("BLOCKED_OFFLINE"
            if any(m in output for m in markers) else "FAIL")


def step_weights_and_probe(work, args, egress):
    """NETWORKED_TODO item 1: weights → convert → probe parity."""
    pretrained = os.path.join(work, "pretrained")
    rc, out = run(
        ["bash", os.path.join(REPO, "download_scripts",
                              "download_pretrained_weights_resnet18.sh"),
         "--output-path", pretrained],
        timeout=3600,
    )
    if rc != 0:
        status = offline_status(out) if not egress else "FAIL"
        return [{"name": "weights_fetch_convert", "status": status,
                 "detail": out.strip().splitlines()[-1] if out.strip() else
                 f"rc={rc}"}]
    ckpt = os.path.join(pretrained, "orbax_resnet18")
    steps = [{"name": "weights_fetch_convert", "status": "PASS",
              "detail": f"converted checkpoint at {ckpt}"}]

    if not args.imagenet_data_path or not os.path.isdir(args.imagenet_data_path):
        steps.append({
            "name": "imagenet_probe_parity", "status": "SKIPPED_NO_DATA",
            "detail": "--imagenet-data-path missing or not a directory; "
                      "re-run with real ImageNet to check top-1 vs "
                      f"{REFERENCE_IMAGENET_TOP1} ± {IMAGENET_TOL}"})
        return steps

    rc, out = run(
        [sys.executable, os.path.join(REPO, "run_end_task_eval.py"),
         "--title", "networked_accept", "--description", "imagenet_probe",
         "--solver", "EndTaskImagenetSolver", "--dataset", "ImagenetDataset",
         "--imagenet-data-path", args.imagenet_data_path,
         "--checkpoint-dir", ckpt, "--backbone", "ResNet18",
         "--vince-embedding-size", "64",
         "--batch-size", "256", "--freeze-feature-extractor",
         "--base-logdir", os.path.join(work, "logs")],
        timeout=4 * 3600,
    )
    m = re.search(r"^EVAL_RESULT (\{.*\})$", out, re.M)
    if rc != 0 or not m:
        steps.append({"name": "imagenet_probe_parity", "status": "FAIL",
                      "detail": f"eval rc={rc}; no EVAL_RESULT line"})
        return steps
    res = json.loads(m.group(1))
    # probes report one accuracy per decoder head (classifier_accuracy_<i>);
    # the reference table reports the best head
    accs = [v for k, v in res.items() if "accuracy" in k]
    top1 = max(accs) if accs else None
    ok = top1 is not None and abs(top1 - REFERENCE_IMAGENET_TOP1) <= IMAGENET_TOL
    steps.append({
        "name": "imagenet_probe_parity",
        "status": "PASS" if ok else "FAIL",
        "detail": f"top-1 {top1} vs reference {REFERENCE_IMAGENET_TOP1} "
                  f"± {IMAGENET_TOL} ({json.dumps(res)})"})
    return steps


def step_colorjitter(egress):
    """NETWORKED_TODO item 2: torchvision parity checker."""
    try:
        import torchvision  # noqa: F401
        have_tv = True
    except ImportError:
        have_tv = False
    if not have_tv:
        if not egress:
            return [{"name": "colorjitter_torchvision", "status": "BLOCKED_OFFLINE",
                     "detail": "torchvision not installed and no egress to "
                               "pip install it"}]
        rc, out = run([sys.executable, "-m", "pip", "install", "torchvision"],
                      timeout=1200)
        if rc != 0:
            return [{"name": "colorjitter_torchvision", "status": "FAIL",
                     "detail": "pip install torchvision failed: "
                               + out.strip().splitlines()[-1]}]
    rc, out = run(
        [sys.executable,
         os.path.join(REPO, "tools", "check_colorjitter_vs_torchvision.py")],
        timeout=1800,
    )
    tail = out.strip().splitlines()[-1] if out.strip() else ""
    if rc != 0 and "torchvision" in out and "required" in out.lower():
        return [{"name": "colorjitter_torchvision", "status": "BLOCKED_OFFLINE",
                 "detail": tail}]
    return [{"name": "colorjitter_torchvision",
             "status": "PASS" if rc == 0 else "FAIL", "detail": tail}]


def step_r2v2_shard(work, egress):
    """NETWORKED_TODO item 3: one R2V2 shard end-to-end."""
    urls_file = os.path.join(REPO, "vince_tpu", "info_files",
                             "r2v2_drive_urls.txt")
    with open(urls_file) as f:
        first = next(line for line in f if line.strip())
    one = os.path.join(work, "one_shard.txt")
    with open(one, "w") as f:
        f.write(first)
    out_dir = os.path.join(work, "r2v2")
    rc, out = run(
        [sys.executable,
         os.path.join(REPO, "download_scripts", "download_r2v2.py"),
         "--urls-file", one, "--output-path", out_dir],
        timeout=3600,
    )
    frames = []
    for dp, _, fs in os.walk(out_dir):
        frames += [os.path.join(dp, x) for x in fs if x.endswith(".jpg")]
    if frames:
        return [{"name": "r2v2_shard", "status": "PASS",
                 "detail": f"{len(frames)} frames extracted "
                           f"(e.g. {os.path.relpath(frames[0], out_dir)})"}]
    status = "FAIL" if egress else offline_status(out)
    tail = out.strip().splitlines()[-1] if out.strip() else f"rc={rc}"
    return [{"name": "r2v2_shard", "status": status, "detail": tail}]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="first_networked_report.json")
    ap.add_argument("--imagenet-data-path", default=os.environ.get(
        "IMAGENET_DATA_PATH", ""))
    ap.add_argument("--work-dir", default=None,
                    help="where downloads land (default: a temp dir)")
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["weights", "colorjitter", "r2v2"],
                    help="skip legs (e.g. to re-run only one)")
    args = ap.parse_args(argv)

    work = args.work_dir or tempfile.mkdtemp(prefix="networked_accept_")
    os.makedirs(work, exist_ok=True)
    egress = have_egress()
    print(f"egress: {egress}; work dir: {work}")

    steps = []
    if "weights" not in args.skip:
        steps += step_weights_and_probe(work, args, egress)
    if "colorjitter" not in args.skip:
        steps += step_colorjitter(egress)
    if "r2v2" not in args.skip:
        steps += step_r2v2_shard(work, egress)

    report = {
        "date": datetime.datetime.now().isoformat(timespec="seconds"),
        "egress": egress,
        "work_dir": work,
        "steps": steps,
        "ok": all(s["status"] != "FAIL" for s in steps),
        "complete": all(s["status"] == "PASS" for s in steps),
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    for s in steps:
        print(f"  {s['status']:16s} {s['name']}: {s['detail'][:120]}")
    print(("all legs PASS" if report["complete"] else
           "no failures (offline/skipped legs remain)" if report["ok"] else
           "FAILURES present") + f"; report → {args.report}")
    if not args.work_dir and report["complete"]:
        shutil.rmtree(work, ignore_errors=True)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
