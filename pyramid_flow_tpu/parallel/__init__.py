from .cp import cp_context, cp_vae_apply, halo_exchange
from .mesh import MeshConfig, make_mesh, param_sharding, batch_spec
from .sp import sp_flash_attention
