"""ConfigMixin/register_to_config with diffusers semantics: the decorator
captures the bound init arguments into ``self._internal_dict`` BEFORE running
the wrapped ``__init__`` (the reference reads ``self.config.*`` inside its
own init, e.g. modeling_pyramid_flux.py:98-99)."""

import functools
import inspect


class FrozenDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


def register_to_config(init):
    @functools.wraps(init)
    def inner_init(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        cfg.pop("kwargs", None)
        ignore = set(getattr(self, "ignore_for_config", []) or [])
        self._internal_dict = FrozenDict(
            {k: v for k, v in cfg.items() if k not in ignore})
        init(self, *args, **kwargs)

    return inner_init


class ConfigMixin:
    config_name = "config.json"

    @property
    def config(self):
        return getattr(self, "_internal_dict", FrozenDict())

    def register_to_config(self, **kwargs):
        d = dict(getattr(self, "_internal_dict", {}))
        d.update(kwargs)
        self._internal_dict = FrozenDict(d)
