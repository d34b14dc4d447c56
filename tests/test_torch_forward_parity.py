"""Numerical forward parity: our flax ResNet18 with weights converted from a
torch ResNet18 must reproduce the torch forward (eval mode) — the end-to-end
validation of conv/BN/stride/padding semantics that checkpoint parity rests on
(SURVEY.md §7 "hard parts"). The torch model here is a minimal standard
BasicBlock ResNet written for the test (torchvision is not installed)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vince_tpu.models import resnet  # noqa: E402
from vince_tpu.utils.torch_convert import convert_resnet_state_dict  # noqa: E402


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18Features(tnn.Module):
    """torchvision-resnet18 feature extractor with torchvision param names."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for layer in range(1, 5):
            cin, cout = chans[layer - 1], chans[layer]
            stride = 1 if layer == 1 else 2
            blocks = tnn.Sequential(
                TorchBasicBlock(cin, cout, stride), TorchBasicBlock(cout, cout, 1)
            )
            setattr(self, f"layer{layer}", blocks)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in range(1, 5):
            x = getattr(self, f"layer{layer}")(x)
        return x


def _torchvision_style_state_dict(model):
    """Rename the test model's downsample keys to torchvision's
    layerL.B.downsample.{0,1}.* convention."""
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("downsample.0.", "downsample.0.").replace(
            "downsample.1.", "downsample.1."
        )
        sd[k] = v.detach().numpy()
    return sd


def test_forward_parity_eval_mode():
    torch.manual_seed(0)
    tmodel = TorchResNet18Features().eval()
    # randomize BN running stats so the test exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = _torchvision_style_state_dict(tmodel)
    params, stats = convert_resnet_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    t_out = t_out.transpose(0, 2, 3, 1)  # NCHW → NHWC

    jmodel = resnet.ResNet18()
    j_out = np.asarray(
        jmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )
    assert j_out.shape == t_out.shape == (2, 2, 2, 512)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_forward_parity_dilated():
    """Dilated variant semantics (stride→dilation in layer3/4) vs torch dilated
    convs — validates the SiamFC dense-feature path."""
    torch.manual_seed(1)

    class TorchDilatedBlock(tnn.Module):
        def __init__(self, cin, cout, dilation, downsample):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, 1, dilation, dilation, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, dilation, dilation, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.down = (
                tnn.Sequential(tnn.Conv2d(cin, cout, 1, 1, bias=False), tnn.BatchNorm2d(cout))
                if downsample else None
            )

        def forward(self, x):
            identity = x if self.down is None else self.down(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + identity)

    tblock = TorchDilatedBlock(64, 64, dilation=2, downsample=False).eval()
    sd = {("conv1." + k if False else k): v.detach().numpy() for k, v in tblock.state_dict().items()}

    from vince_tpu.models.resnet import BasicBlock
    import functools
    import flax.linen as nn

    norm = functools.partial(nn.BatchNorm, use_running_average=True)
    jblock = BasicBlock(filters=64, norm=norm, strides=1, dilation=2, downsample=False)
    # map names: conv1/conv2/bn1/bn2
    params = {
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)},
        "conv2": {"kernel": sd["conv2.weight"].transpose(2, 3, 1, 0)},
    }
    stats = {}
    for bn in ("bn1", "bn2"):
        params[bn] = {"scale": sd[f"{bn}.weight"], "bias": sd[f"{bn}.bias"]}
        stats[bn] = {"mean": sd[f"{bn}.running_mean"], "var": sd[f"{bn}.running_var"]}

    rng = np.random.RandomState(2)
    x = rng.randn(1, 16, 16, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tblock(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    j_out = np.asarray(jblock.apply({"params": params, "batch_stats": stats}, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)
