import torch


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """diffusers.utils.torch_utils.randn_tensor semantics (CPU env): sample
    with the given generator(s), then move to device/dtype."""
    if isinstance(generator, (list, tuple)):
        parts = [
            torch.randn(shape[1:], generator=g, dtype=dtype)
            for g in generator
        ]
        t = torch.stack(parts, dim=0)
    else:
        t = torch.randn(shape, generator=generator, dtype=dtype)
    return t.to(device=device)
