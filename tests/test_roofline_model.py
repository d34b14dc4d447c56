"""The analytic roofline tool's op lists should track the known per-image
FLOP counts of the backbones (reference models: R50 ~8.2 GFLOP, R18 ~3.6,
B0 ~0.8 per 224² image; ours run slightly higher from the bn-fold moment
dots). Guards the op tables in tools/roofline_model.py against drift."""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "roofline_model",
    os.path.join(os.path.dirname(__file__), "..", "tools", "roofline_model.py"),
)
roofline = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(roofline)


def _fwd_gflop_per_image(ops, n):
    return sum(o["flops"] for o in ops) / n / 1e9


def test_resnet50_flops():
    g = _fwd_gflop_per_image(roofline.resnet_layers(50, 128, 224), 128)
    assert 8.0 < g < 9.5, g  # 8.2 + moment dots


def test_resnet18_flops():
    g = _fwd_gflop_per_image(roofline.resnet_layers(18, 256, 224), 256)
    assert 3.3 < g < 4.2, g


def test_effnet_b0_flops():
    g = _fwd_gflop_per_image(roofline.effnet_layers(128, 224, "b0"), 128)
    assert 0.75 < g < 1.1, g  # 0.78 + moment dots


def test_effnet_family_flops_scale():
    # compound scaling at a fixed 224² bench resolution (the published MACs
    # are at native 240-380² — rescaled by (224/res)², ×2, + moment dots):
    # B1 ~1.2, B2 ~1.4, B3 ~2.0, B4 ~3.1 GFLOP/img
    bands = {"b1": (1.0, 1.5), "b2": (1.2, 1.7), "b3": (1.8, 2.5), "b4": (2.8, 3.8)}
    prev = _fwd_gflop_per_image(roofline.effnet_layers(128, 224, "b0"), 128)
    for v, (lo, hi) in bands.items():
        g = _fwd_gflop_per_image(roofline.effnet_layers(128, 224, v), 128)
        assert lo < g < hi, (v, g)
        assert g > prev, (v, g, prev)  # monotone up the family
        prev = g


def test_floors_are_bandwidth_dominated():
    # every benched backbone's traffic floor exceeds its FLOP floor on v5e
    for ops in (
        roofline.resnet_layers(50, 128, 224),
        roofline.resnet_layers(18, 256, 224),
        roofline.effnet_layers(128, 224, "b0"),
    ):
        flops = sum(o["flops"] for o in ops)
        bytes_ = sum(o["bytes"] for o in ops)
        assert bytes_ / roofline.PEAK_BW > flops / roofline.PEAK_TF
