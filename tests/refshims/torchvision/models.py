"""torchvision.models.vgg16 shim: the standard VGG-16 'D' configuration with
torchvision's exact ``features`` Sequential layer indexing, so the
reference's LPIPS slices ([0:4), [4:9), [9:16), [16:23), [23:30)) and any
vgg_lpips state dict line up. Weights are random unless loaded."""

import torch.nn as nn

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class VGG(nn.Module):
    def __init__(self, features, num_classes=1000):
        super().__init__()
        self.features = features
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        return self.classifier(x.flatten(1))


def vgg16(pretrained=False, **kwargs):
    if pretrained:
        raise RuntimeError(
            "pretrained torchvision weights are unavailable in the test "
            "environment; load an explicit state dict instead")
    layers, in_c = [], 3
    for v in _VGG16_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_c, v, kernel_size=3, padding=1),
                       nn.ReLU(inplace=True)]
            in_c = v
    return VGG(nn.Sequential(*layers))
