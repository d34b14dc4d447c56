"""Fetch the released VINCE pretrained weights and convert them to Orbax.

Parity with reference ``download_scripts/download_pretrained_weights_resnet{18,50}.sh``
(gdown + untar; Drive ids published in reference README.md:95-102), extended
with the torch→JAX conversion step so the result is directly loadable with
``--checkpoint-dir``. Offline environments get a clear report and exit.
"""

import argparse
import os
import tarfile

from vince_tpu.scrape.drive import drive_fetch

# Published Drive ids (reference README.md:95-102 / download_scripts/*.sh)
DRIVE_IDS = {
    "ResNet18": "1L2SZvsvpxe-A1gCN9Nxg9LwB_d604aQf",
    "ResNet50": "11TfKfZLLx2FYCATjkll5nUIOxSgSBWGi",
}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Download released VINCE weights")
    parser.add_argument("--backbone", choices=sorted(DRIVE_IDS), default="ResNet18")
    parser.add_argument("--output-path", default="pretrained")
    parser.add_argument("--skip-convert", action="store_true",
                        help="only download/extract the torch checkpoint")
    args = parser.parse_args(argv)

    os.makedirs(args.output_path, exist_ok=True)
    tar_path = os.path.join(
        args.output_path, f"pretrained_weights_{args.backbone.lower()}.tar"
    )
    file_id = DRIVE_IDS[args.backbone]
    url = f"https://drive.google.com/uc?export=download&id={file_id}"
    try:
        print(f"fetching {args.backbone} weights: {url}")
        # large-file confirm flow — a plain GET returns Drive's virus-scan
        # HTML page for these multi-hundred-MB tars (gdown equivalent)
        drive_fetch(file_id, tar_path)
    except OSError as e:
        raise SystemExit(f"download failed ({e}); offline environment? "
                         f"Fetch the tar manually from {url} and re-run.")
    try:
        with tarfile.open(tar_path) as tf:
            # filter="data": no path traversal out of output_path
            tf.extractall(args.output_path, filter="data")
    except tarfile.ReadError as e:
        raise SystemExit(
            f"{tar_path} is not a tar ({e}) — Drive likely served an "
            f"interstitial page; fetch manually from {url} and re-run."
        )
    os.remove(tar_path)

    ckpts = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(args.output_path)
        for f in fs
        if f.endswith((".pt", ".pth", ".pytorch"))
    ]
    if not ckpts:
        raise SystemExit(f"no torch checkpoint found under {args.output_path}")
    print(f"extracted: {ckpts}")
    if args.skip_convert:
        return
    # tools/ is a script directory (no package): resolve it from the repo
    # layout so the conversion works from any cwd / an installed vince_tpu
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from tools.convert_reference_checkpoint import main as convert

    out = os.path.join(args.output_path, f"orbax_{args.backbone.lower()}")
    # R50 "large" runs use MoCoV2 hyperparams: 128-d embeddings
    # (reference README.md:99, vince/train_vince_large.sh)
    embed = {"ResNet18": "64", "ResNet50": "128"}[args.backbone]
    convert([
        "--torch-checkpoint", ckpts[0],
        "--output-dir", out,
        "--backbone", args.backbone,
        "--embed-size", embed,
    ])
    print(f"converted → {out} (use --checkpoint-dir {out})")


if __name__ == "__main__":
    main()
