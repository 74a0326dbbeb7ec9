"""LoRA-compatible layers: plain conv/linear whose forward tolerates the
optional ``scale`` argument diffusers passes. Only the unused 2D VAE block
twins reference these."""

import torch.nn as nn


class LoRACompatibleConv(nn.Conv2d):
    def forward(self, x, scale: float = 1.0):  # noqa: ARG002
        return super().forward(x)


class LoRACompatibleLinear(nn.Linear):
    def forward(self, x, scale: float = 1.0):  # noqa: ARG002
        return super().forward(x)
