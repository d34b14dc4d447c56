#!/usr/bin/env python
"""Verify the fused on-device ColorJitter against REAL torchvision.

The in-tree parity test (tests/test_augment.py::
test_color_jitter_matches_numpy_oracle) compares against a self-authored
numpy oracle because torchvision is not installed in the build sandbox.
This script is the networked-host closure of that loop
(docs/NETWORKED_TODO.md item 2): it drives torchvision's own
``transforms.functional`` adjust_* chain in the identical per-sample op
order with identical factors and compares elementwise.

Reference semantics being checked (reference transforms.py:68 →
torchvision.transforms.ColorJitter.forward): ``fn_idx = randperm(4)`` per
sample, factors drawn upfront, ops applied in fn_idx order on float
tensors in [0, 1].

Usage (any host with torchvision):
    pip install torchvision
    python tools/check_colorjitter_vs_torchvision.py [--n 96] [--hw 24]

Exit 0 iff max |ours - torchvision| <= --tol (default 1e-4, f32 HSV
round-trip headroom). Prints the per-op-order error table either way.
"""
import argparse
import sys
from itertools import permutations

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96,
                    help="samples (>=24 so every op order is covered)")
    ap.add_argument("--hw", type=int, default=24, help="image side")
    ap.add_argument("--tol", type=float, default=1e-4,
                    help="max-abs-error pass threshold")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        import torch
        import torchvision.transforms.functional as F
    except ImportError as e:
        print(f"SKIP: torchvision not available ({e}). This script exists "
              "for networked hosts — see docs/NETWORKED_TODO.md item 2.")
        return 2

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401  (augment imports jnp)

    from vince_tpu.ops.augment import AugmentConfig, color_jitter_apply

    rng = np.random.RandomState(args.seed)
    n, hw = args.n, args.hw
    img = rng.rand(n, hw, hw, 3).astype(np.float32)
    all_orders = np.array(list(permutations(range(4))), np.int32)  # 24
    perm = all_orders[np.arange(n) % 24]
    fb = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fc = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fs = rng.uniform(0.6, 1.4, n).astype(np.float32)
    fh = rng.uniform(-0.2, 0.2, n).astype(np.float32)

    cfg = AugmentConfig(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.2)
    ours = np.asarray(color_jitter_apply(
        jnp.asarray(img), jnp.asarray(perm), jnp.asarray(fb),
        jnp.asarray(fc), jnp.asarray(fs), jnp.asarray(fh), cfg))

    # torchvision chain: CHW float tensors, same op order/factors per sample
    theirs = np.empty_like(img)
    for i in range(n):
        t = torch.from_numpy(img[i].transpose(2, 0, 1))
        for op in perm[i]:
            if op == 0:
                t = F.adjust_brightness(t, float(fb[i]))
            elif op == 1:
                t = F.adjust_contrast(t, float(fc[i]))
            elif op == 2:
                t = F.adjust_saturation(t, float(fs[i]))
            else:
                t = F.adjust_hue(t, float(fh[i]))
        theirs[i] = t.numpy().transpose(1, 2, 0)

    err = np.abs(ours - theirs)
    per_sample = err.reshape(n, -1).max(1)
    print(f"torchvision {getattr(sys.modules['torchvision'], '__version__', '?')}"
          f"  n={n} hw={hw}  max_abs_err={err.max():.3e}  "
          f"mean_abs_err={err.mean():.3e}")
    print("worst 5 samples (order: 0=bright 1=contrast 2=sat 3=hue):")
    for i in np.argsort(per_sample)[-5:][::-1]:
        print(f"  sample {i:3d} order={tuple(perm[i])} "
              f"fb={fb[i]:.3f} fc={fc[i]:.3f} fs={fs[i]:.3f} fh={fh[i]:+.3f}"
              f"  err={per_sample[i]:.3e}")
    ok = err.max() <= args.tol
    print("PASS" if ok else f"FAIL (tol {args.tol:g})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
