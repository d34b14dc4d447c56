"""Global constants.

Capability parity with reference ``constants.py:13-30``: norm-layer / nonlinearity
factories, run timestamp, ImageNet normalization constants. Values are expressed
for NHWC float tensors (TPU-native layout) instead of NCHW uint8*255.
"""

import datetime

import numpy as np

# Reference constants.py:28-29 stores mean/std scaled by 255 for uint8 tensors.
# We keep both: uint8-scale (host pipeline) and unit-scale (on-device float path).
IMAGENET_MEAN_255 = np.array([0.485, 0.456, 0.406], dtype=np.float32) * 255.0
IMAGENET_STD_255 = np.array([0.229, 0.224, 0.225], dtype=np.float32) * 255.0
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Reference constants.py:13-22 — factories chosen once and used everywhere.
NORM_LAYER = "batchnorm"  # {"batchnorm", "groupnorm", "syncbatchnorm"}
NONLINEARITY = "relu"

# Reference constants.py:23 — timestamp string embedded in checkpoint paths.
TIME_STR = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")

COOKIE_PATH = ""  # reference constants.py:30 (youtube scrape cookie file)
