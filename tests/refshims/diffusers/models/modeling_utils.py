import torch


class ModelMixin(torch.nn.Module):
    _supports_gradient_checkpointing = False

    @property
    def dtype(self):
        try:
            return next(self.parameters()).dtype
        except StopIteration:
            return torch.float32

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def enable_gradient_checkpointing(self):
        if hasattr(self, "_set_gradient_checkpointing"):
            self.apply(
                lambda m: self._set_gradient_checkpointing(m, True))

    def disable_gradient_checkpointing(self):
        if hasattr(self, "_set_gradient_checkpointing"):
            self.apply(
                lambda m: self._set_gradient_checkpointing(m, False))
