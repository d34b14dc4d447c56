#!/bin/sh
# Released VINCE ResNet50 weights -> Orbax checkpoint (reference
# download_scripts/download_pretrained_weights_resnet50.sh + conversion).
python -m vince_tpu.scrape.download_pretrained_weights --backbone ResNet50 "$@"
