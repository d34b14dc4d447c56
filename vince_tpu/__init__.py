"""vince_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for self-supervised
video representation learning, with the capabilities of danielgordon10/vince.

Layer map (mirrors the reference's capabilities, re-architected functionally):
  - ``vince_tpu.utils``     core lib: pytree helpers, meters, loggers, checkpoints
  - ``vince_tpu.parallel``  device mesh bootstrap + sharding rules
  - ``vince_tpu.ops``       contrastive core: queue, EMA, InfoNCE (XLA + Pallas),
                            on-device augmentation, cross-correlation
  - ``vince_tpu.models``    ResNet backbones, VINCE encoder, probes, LSTM, SiamFC
  - ``vince_tpu.data``      datasets + host input pipeline
  - ``vince_tpu.solvers``   training engines (pretrain + end tasks)
  - ``vince_tpu.tracking``  SiamFC tracker inference + OTB/GOT-10k evaluation
"""

__version__ = "0.1.0"
