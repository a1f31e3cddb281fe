#!/bin/bash -e
# ImageNet weight initialization (parity: reference initialize.sh).
# The reference uses Facebook's semi-weakly-supervised ResNet-18 for the
# main backbone and torchvision's vanilla ResNet-18 for the pose encoder.
#
# Download (on a machine with network access):
#   semi_weakly_supervised_resnet18:
#     https://dl.fbaipublicfiles.com/semiweaksupervision/model_files/semi_weakly_supervised_resnet18-118f1556.pth
#   torchvision resnet18:
#     https://download.pytorch.org/models/resnet18-f37072fd.pth
#
# Then convert:
mkdir -p weights
python tools/convert_torchvision_weights.py \
  --backbone "${1:-semi_weakly_supervised_resnet18-118f1556.pth}" \
  --pose "${2:-resnet18-f37072fd.pth}" \
  --output weights/imagenet_weights.npz
echo "weights/imagenet_weights.npz ready; set MODEL.WEIGHTS or pass"
echo "--weights to tools/train_net.py (grafted via utils/weights.py)"
