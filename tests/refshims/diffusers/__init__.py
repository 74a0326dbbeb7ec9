"""Minimal diffusers shim for importing /root/reference model modules in
tests. See tests/refshims/README.md."""

from . import configuration_utils, models, schedulers, utils  # noqa: F401
