import logging as _pylogging

import torch


class BaseOutput(dict):
    """Dict with attribute access. The reference declares its outputs as
    ``@dataclass class X(BaseOutput)``; the dataclass-generated __init__
    assigns fields via setattr, which lands in the dict."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.values())[k]
        return dict.__getitem__(self, k)


def is_torch_version(operation: str, version: str) -> bool:
    from packaging.version import parse

    cur = parse(torch.__version__.split("+")[0])
    ref = parse(version)
    return {
        ">=": cur >= ref, ">": cur > ref, "<=": cur <= ref,
        "<": cur < ref, "==": cur == ref, "!=": cur != ref,
    }[operation]


def deprecate(*args, **kwargs):
    return None


def maybe_allow_in_graph(cls):
    return cls


class logging:  # noqa: N801 - mimics diffusers.utils.logging module
    @staticmethod
    def get_logger(name=None):
        return _pylogging.getLogger(name or "diffusers")
