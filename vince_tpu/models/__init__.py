from vince_tpu.models import backbones  # noqa: F401
