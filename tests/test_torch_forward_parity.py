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
    """Full dilated-R18 network parity (the SiamFC dense-feature path):
    replace_stride_with_dilation=(False, True, True) with the reference's
    exact semantics — first block of a dilated stage keeps previous_dilation
    (reference resnet.py:201-213), later blocks dilate, and the vendored
    BasicBlock dilates ONLY conv1 (:68, conv2 stays dilation-1 :71)."""
    torch.manual_seed(1)

    class TorchDilatedBasicBlock(tnn.Module):
        def __init__(self, cin, cout, stride, dilation, downsample):
            super().__init__()
            # reference resnet.py:68-71 — conv1 dilated, conv2 NOT
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, dilation, dilation, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.relu = tnn.ReLU()
            self.downsample = (
                tnn.Sequential(tnn.Conv2d(cin, cout, 1, stride, bias=False),
                               tnn.BatchNorm2d(cout))
                if downsample else None
            )

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + identity)

    class TorchResNet18Dilated(tnn.Module):
        """reference _make_layer with replace_stride_with_dilation=(F, T, T)."""

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            chans = [64, 64, 128, 256, 512]
            dilate = [None, False, False, True, True]
            dilation = 1
            for layer in range(1, 5):
                cin, cout = chans[layer - 1], chans[layer]
                stride = 1 if layer == 1 else 2
                previous_dilation = dilation
                if dilate[layer]:
                    dilation *= stride
                    stride = 1
                blocks = tnn.Sequential(
                    TorchDilatedBasicBlock(
                        cin, cout, stride, previous_dilation,
                        downsample=(stride != 1 or cin != cout)),
                    TorchDilatedBasicBlock(cout, cout, 1, dilation, downsample=False),
                )
                setattr(self, f"layer{layer}", blocks)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for layer in range(1, 5):
                x = getattr(self, f"layer{layer}")(x)
            return x

    tmodel = TorchResNet18Dilated().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_resnet_state_dict(sd)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    t_out = t_out.transpose(0, 2, 3, 1)

    jmodel = resnet.ResNet18SiamFCDilated()
    j_out = np.asarray(
        jmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )
    # stride 8 retained: 64 // 8 = 8 spatial
    assert j_out.shape == t_out.shape == (1, 8, 8, 512)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=3e-4)


# ---------------------------------------------------------------------------
# EfficientNet-B0 parity: our flax EfficientNet with weights converted from a
# torch model using the reference package's naming (`efficientnet_pytorch`,
# reference backbone_models.py:92-124) and its TF-SAME static padding.
# ---------------------------------------------------------------------------

import math  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])


def _swish(x):
    return x * torch.sigmoid(x)


class TorchMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, kernel, stride):
        super().__init__()
        self.kernel, self.stride, self.expand = kernel, stride, expand
        self.cin, self.cout = cin, cout
        mid = cin * expand
        if expand != 1:
            self._expand_conv = tnn.Conv2d(cin, mid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(mid, eps=1e-3)
        self._depthwise_conv = tnn.Conv2d(mid, mid, kernel, stride, 0, groups=mid, bias=False)
        self._bn1 = tnn.BatchNorm2d(mid, eps=1e-3)
        sq = max(1, int(cin * 0.25))
        self._se_reduce = tnn.Conv2d(mid, sq, 1)
        self._se_expand = tnn.Conv2d(sq, mid, 1)
        self._project_conv = tnn.Conv2d(mid, cout, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, inputs):
        x = inputs
        if self.expand != 1:
            x = _swish(self._bn0(self._expand_conv(x)))
        x = _tf_same_pad(x, self.kernel, self.stride)
        x = _swish(self._bn1(self._depthwise_conv(x)))
        s = F.adaptive_avg_pool2d(x, 1)
        s = self._se_expand(_swish(self._se_reduce(s)))
        x = torch.sigmoid(s) * x
        x = self._bn2(self._project_conv(x))
        if self.stride == 1 and self.cin == self.cout:
            x = x + inputs
        return x


class TorchEfficientNetB0Features(tnn.Module):
    """efficientnet_pytorch-style B0 feature extractor (param names match)."""

    _STAGES = (  # (expand, out, repeats, stride, kernel)
        (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
        (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3),
    )

    def __init__(self):
        super().__init__()
        self._conv_stem = tnn.Conv2d(3, 32, 3, 2, 0, bias=False)
        self._bn0 = tnn.BatchNorm2d(32, eps=1e-3)
        blocks = []
        cin = 32
        for expand, cout, repeats, stride, kernel in self._STAGES:
            for r in range(repeats):
                blocks.append(TorchMBConv(cin, cout, expand, kernel, stride if r == 0 else 1))
                cin = cout
        self._blocks = tnn.ModuleList(blocks)
        self._conv_head = tnn.Conv2d(cin, 1280, 1, bias=False)
        self._bn1 = tnn.BatchNorm2d(1280, eps=1e-3)

    def forward(self, x):
        x = _swish(self._bn0(self._conv_stem(_tf_same_pad(x, 3, 2))))
        for b in self._blocks:
            x = b(x)
        return _swish(self._bn1(self._conv_head(x)))


def test_efficientnet_forward_parity_eval_mode():
    from vince_tpu.models.efficientnet import EfficientNet
    from vince_tpu.utils.torch_convert import convert_efficientnet_state_dict

    torch.manual_seed(0)
    tmodel = TorchEfficientNetB0Features().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, stats = convert_efficientnet_state_dict(sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    t_out = t_out.transpose(0, 2, 3, 1)

    jmodel = EfficientNet(variant="b0")
    j_out = np.asarray(
        jmodel.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False)
    )
    assert j_out.shape == t_out.shape == (2, 2, 2, 1280)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=5e-4)
