"""Import-only transforms namespace (the reference pipeline imports it at
module scope but the parity tests never execute transform objects)."""


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


def _unavailable(name):
    class _T:
        def __init__(self, *a, **k):
            raise RuntimeError(f"torchvision.transforms.{name} shim is "
                               "import-only in the test environment")
    _T.__name__ = name
    return _T


Resize = _unavailable("Resize")
CenterCrop = _unavailable("CenterCrop")
RandomCrop = _unavailable("RandomCrop")
ToTensor = _unavailable("ToTensor")
Normalize = _unavailable("Normalize")
InterpolationMode = type("InterpolationMode", (), {
    "BILINEAR": "bilinear", "BICUBIC": "bicubic", "NEAREST": "nearest"})
