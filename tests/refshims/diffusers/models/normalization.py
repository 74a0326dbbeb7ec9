import torch.nn as nn
import torch.nn.functional as F

from .activations import get_activation


class AdaGroupNorm(nn.Module):
    """diffusers AdaGroupNorm (only reachable via the non-default
    resnet_time_scale_shift='ada_group' config)."""

    def __init__(self, embedding_dim, out_dim, num_groups, act_fn=None,
                 eps=1e-5):
        super().__init__()
        self.num_groups = num_groups
        self.eps = eps
        self.act = get_activation(act_fn) if act_fn else None
        self.linear = nn.Linear(embedding_dim, out_dim * 2)

    def forward(self, x, emb):
        if self.act:
            emb = self.act(emb)
        emb = self.linear(emb)[:, :, None, None]
        scale, shift = emb.chunk(2, dim=1)
        x = F.group_norm(x, self.num_groups, eps=self.eps)
        return x * (1 + scale) + shift
