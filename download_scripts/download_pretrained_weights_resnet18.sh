#!/bin/sh
# Released VINCE ResNet18 weights -> Orbax checkpoint (reference
# download_scripts/download_pretrained_weights_resnet18.sh + conversion).
python -m vince_tpu.scrape.download_pretrained_weights --backbone ResNet18 "$@"
