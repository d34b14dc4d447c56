#!/usr/bin/env python
"""Analytic roofline model for the VINCE pretrain step (no hardware needed).

For every op in the R50/R18 VINCE step (query fwd + key fwd + query bwd
[dgrad+wgrad] + BN stat/apply passes + augmentation + InfoNCE + update), this
computes FLOPs and *minimal* HBM traffic (each operand read once, each result
written once, bf16 activations / f32 stats), then the per-op floor
``max(flops/PEAK_TF, bytes/PEAK_BW)`` and the composite step floor.

This is the math behind docs/PERFORMANCE.md's round-2 bound: compare the
composite floor (optimal emitter, perfect fusion) against the measured step
and the trace-measured actual traffic. Usage:

    python tools/roofline_model.py [ResNet50|ResNet18] [batch] [image]
"""
import re
import sys

PEAK_TF = 197e12  # v5e bf16
PEAK_BW = 819e9  # v5e HBM
A = 2  # bf16 bytes
S = 4  # f32 bytes


def conv_ops(n, h, w, cin, cout, k, stride=1, name=""):
    ho, wo = h // stride, w // stride
    flops = 2 * n * ho * wo * cin * cout * k * k
    bytes_ = n * h * w * cin * A + n * ho * wo * cout * A + k * k * cin * cout * A
    return {"name": name, "flops": flops, "bytes": bytes_,
            "out": (n, ho, wo, cout)}


def bn_ops(n, h, w, c, fused_stats=False, name=""):
    """BN train forward: stat reduce (read act once, unless fused into the
    producing conv's epilogue) + apply (read + write act)."""
    act = n * h * w * c * A
    stat = 0 if fused_stats else act
    return {"name": name, "flops": 0, "bytes": stat + 2 * act, "out": (n, h, w, c)}


def resnet_layers(depth, n, img, width=1):
    """(name, kind, shape) op list for one forward pass, bn-fold 'expand'.
    ``width`` is the SimCLR-style channel multiplier (ResNet50w2 etc.):
    conv FLOPs scale ~width², activation traffic ~width — arithmetic
    intensity grows ~width, which is what makes the w2 variant the MXU
    positive-control config (VERDICT r4 item 5)."""
    ops = []
    c0 = 64 * width
    h = img // 2  # s2d stem output 112
    ops.append(conv_ops(n, img, img, 3, c0, 7, 2, "stem conv"))
    ops.append(bn_ops(n, h, h, c0, fused_stats=True, name="stem bn"))
    h = h // 2  # maxpool 56
    ops.append({"name": "maxpool", "flops": 0,
                "bytes": n * (2 * h) * (2 * h) * c0 * A + n * h * h * c0 * A,
                "out": (n, h, h, c0)})
    if depth == 50:
        stages = [(3, 64 * width), (4, 128 * width), (6, 256 * width),
                  (3, 512 * width)]
        for si, (blocks, cm) in enumerate(stages):
            cin = c0 if si == 0 else stages[si - 1][1] * 4
            stride = 1 if si == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                ci = cin if b == 0 else cm * 4
                # conv1 1x1 reduce (+bn stats fused into dot; apply fused
                # into conv2's operand read → apply traffic ~0)
                ops.append(conv_ops(n, h, h, ci, cm, 1, 1, f"s{si+1}b{b} conv1"))
                ops.append(conv_ops(n, h, h, cm, cm, 3, s, f"s{si+1}b{b} conv2"))
                h2 = h // s
                # bn2 stats: separate reduce over conv2 output (read once)
                ops.append({"name": f"s{si+1}b{b} bn2stat", "flops": 0,
                            "bytes": n * h2 * h2 * cm * A, "out": None})
                # folded conv3: normalize+relu producer materialization
                # (multiply_add write+read) + moment dot + main dot; minimal
                # = read act once + write out + xTx negligible
                ops.append(conv_ops(n, h2, h2, cm, cm * 4, 1, 1, f"s{si+1}b{b} conv3(fold)"))
                ops[-1]["flops"] += 2 * n * h2 * h2 * cm * cm  # xTx moment dot
                if b == 0:
                    ops.append(conv_ops(n, h, h, ci, cm * 4, 1, s, f"s{si+1}b0 ds(fold)"))
                    ops[-1]["flops"] += 2 * n * h * h * ci * ci // (s * s)
                h = h2
    else:  # ResNet18
        stages = [(2, 64 * width), (2, 128 * width), (2, 256 * width),
                  (2, 512 * width)]
        for si, (blocks, cm) in enumerate(stages):
            cin = c0 if si == 0 else stages[si - 1][1]
            stride = 1 if si == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                ci = cin if b == 0 else cm
                ops.append(conv_ops(n, h, h, ci, cm, 3, s, f"s{si+1}b{b} conv1"))
                h2 = h // s
                ops.append(bn_ops(n, h2, h2, cm, fused_stats=True, name=f"s{si+1}b{b} bn1"))
                ops.append(conv_ops(n, h2, h2, cm, cm, 3, 1, f"s{si+1}b{b} conv2"))
                ops.append(bn_ops(n, h2, h2, cm, fused_stats=True, name=f"s{si+1}b{b} bn2"))
                if b == 0 and si > 0:
                    ops.append(conv_ops(n, h, h, ci, cm, 1, s, f"s{si+1}b0 ds(fold)"))
                h = h2
    return ops


def dwconv_ops(n, h, w, c, k, stride=1, name=""):
    """Depthwise k×k: per-channel spatial conv — k² FLOP per element, so
    arithmetic intensity ≈ k²/2 FLOP/byte (bandwidth-bound at any k ≤ 15;
    runs as a VPU/vector op on TPU, never fills the MXU)."""
    ho, wo = h // stride, w // stride
    flops = 2 * n * ho * wo * c * k * k
    bytes_ = n * h * w * c * A + n * ho * wo * c * A + k * k * c * A
    return {"name": name, "flops": flops, "bytes": bytes_, "out": (n, ho, wo, c)}


# (blocks, kernel, stride, cout, expand) per stage — EfficientNet-B0 @224
_B0_STAGES = [
    (1, 3, 1, 16, 1), (2, 3, 2, 24, 6), (2, 5, 2, 40, 6), (3, 3, 2, 80, 6),
    (3, 5, 1, 112, 6), (4, 5, 2, 192, 6), (1, 3, 1, 320, 6),
]


def effnet_layers(n, img, variant="b0"):
    """Op list for one EfficientNet forward, bn-fold expand (expand-conv BN
    folded into the dot; dw/project BN stats counted as one extra read — the
    SE pool is the same barrier so it shares that read under perfect fusion).
    B1–B4 apply the package's compound scaling (width via round_filters,
    depth via round_repeats — models/efficientnet.py:33-51)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vince_tpu.models.efficientnet import _SCALING, round_filters, round_repeats

    wm, dm = _SCALING[variant]
    ops = []
    h = img // 2
    stem = round_filters(32, wm)
    ops.append(conv_ops(n, img, img, 3, stem, 3, 2, "stem conv3"))
    cin = stem
    for si, (blocks0, k, stride, cout0, expand) in enumerate(_B0_STAGES):
        blocks = round_repeats(blocks0, dm)
        cout = round_filters(cout0, wm)
        for b in range(blocks):
            s = stride if b == 0 else 1
            ci = cin if b == 0 else cout
            cmid = ci * expand
            if expand != 1:
                # folded expand 1×1 as dot (+ xTx moment dot, 1/expand of main)
                ops.append(conv_ops(n, h, h, ci, cmid, 1, 1, f"s{si+1}b{b} expand(fold)"))
                ops[-1]["flops"] += 2 * n * h * h * ci * ci
            ops.append(dwconv_ops(n, h, h, cmid, k, s, f"s{si+1}b{b} dw{k}"))
            h //= s
            # dw-BN stat + SE pool barrier: one extra read of the dw output
            ops.append({"name": f"s{si+1}b{b} dwstat+SE", "flops": 0,
                        "bytes": n * h * h * cmid * A, "out": None})
            ops.append(conv_ops(n, h, h, cmid, cout, 1, 1, f"s{si+1}b{b} project"))
            # project-BN stat (no activation, not folded): one extra read
            ops.append({"name": f"s{si+1}b{b} projstat", "flops": 0,
                        "bytes": n * h * h * cout * A, "out": None})
        cin = cout
    # head channels: max(1280·wm, 1280) per the package (B0/B1:1280,
    # B2:1408, B3:1536, B4:1792)
    head = round_filters(1280, wm) if wm > 1.0 else 1280
    ops.append(conv_ops(n, h, h, cin, head, 1, 1, "head conv(fold)"))
    ops[-1]["flops"] += 2 * n * h * h * cin * cin
    return ops


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "ResNet50"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 224

    m = re.search(r"[Bb]([0-4])", arch) if ("Efficient" in arch or re.match(r"^[Bb][0-4]$", arch)) else None
    if m:
        depth = f"B{m.group(1)}"
        fwd = effnet_layers(n, img, variant=f"b{m.group(1)}")
    else:
        depth = 50 if "50" in arch else 18
        wm = re.search(r"w(\d)", arch)
        width = int(wm.group(1)) if wm else 1
        fwd = resnet_layers(depth, n, img, width=width)
        if width > 1:
            depth = f"{depth}w{width}"
    fwd_flops = sum(o["flops"] for o in fwd)
    fwd_bytes = sum(o["bytes"] for o in fwd)

    # step composition: key fwd (1x) + query fwd (1x) + query bwd (dgrad +
    # wgrad ≈ 2x fwd FLOPs; traffic ≈ 2x fwd + cotangent streams ≈ 2.5x)
    flops = fwd_flops * 4
    bytes_ = fwd_bytes * (1 + 1 + 2.5)
    # augmentation (separable matmuls, measured ~3 ms) + InfoNCE q·[K;queue]T
    D, K = 128, 65536
    info_flops = 2 * n * D * (n + K) * 2  # fwd + bwd
    info_bytes = (K * D * S) * 2 + n * (n + K) * S * 2
    flops += info_flops
    bytes_ += info_bytes
    aug_ms = 3.0

    flop_floor = flops / PEAK_TF * 1e3
    bw_floor = bytes_ / PEAK_BW * 1e3
    # per-op composite floor (each op independently at its own roofline)
    per_op = sum(
        max(o["flops"] / PEAK_TF, o["bytes"] / PEAK_BW) for o in fwd
    ) * 4.5 * 1e3 + max(info_flops / PEAK_TF, info_bytes / PEAK_BW) * 1e3

    name = f"EfficientNet-{depth}" if isinstance(depth, str) else f"ResNet{depth}"
    print(f"{name} b={n} @{img}²  (bn-fold expand, bf16)")
    print(f"  encoder fwd: {fwd_flops/1e12:.2f} TFLOP, minimal traffic {fwd_bytes/1e9:.2f} GB")
    print(f"  step totals: {flops/1e12:.2f} TFLOP, minimal traffic {bytes_/1e9:.2f} GB")
    print(f"  FLOP floor   : {flop_floor:6.1f} ms  (100% MXU)")
    print(f"  traffic floor: {bw_floor:6.1f} ms  (HBM peak, perfect fusion)")
    print(f"  per-op composite floor (+aug): {per_op + aug_ms:6.1f} ms")
    print(f"  implied MXU ceiling at the per-op floor: "
          f"{flop_floor / (per_op + aug_ms) * 100:.0f}%")
    if depth == 50 and n == 128:
        print("  measured (v5e): 65 ms/step, trace traffic 61.9 GB/step → "
              f"XLA streams {61.9 / (bytes_/1e9):.1f}× the minimal traffic; "
              "the step runs at ~73% of the per-op composite floor")


if __name__ == "__main__":
    main()
