from .flux.model import FluxConfig, PyramidFluxTransformer
from .mmdit.model import MMDiTConfig, PyramidDiffusionMMDiT
from .vae.model import CausalVideoVAE, VAEConfig
