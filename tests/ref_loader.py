"""Import the ACTUAL reference implementation (/root/reference) for parity
tests, using the dependency shims in tests/refshims (diffusers / timm /
torchvision are not installed in this environment; everything else the
reference needs — torch, transformers, accelerate, einops, tqdm, PIL,
tensorboardX — is).

VERDICT round-1 item #1: parity must be proven against the reference's own
forward, not a re-derivation. This module is the bridge."""

import importlib
import os
import sys

SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshims")
REFERENCE = "/root/reference"


def load_reference_module(name: str):
    """Import ``name`` (e.g. 'video_vae.modeling_causal_vae') with the shim
    packages and the reference root on sys.path."""
    for p in (REFERENCE, SHIMS):
        if p not in sys.path:
            sys.path.insert(0, p)
    return importlib.import_module(name)
