from .cosine_ddpm import DDPMCosineScheduler, get_scheduler
from .flow_matching import PyramidFlowMatchEulerDiscreteScheduler, euler_step
