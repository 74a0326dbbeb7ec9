from .train_state import TrainConfig, TrainState, create_train_state
from .trainer import make_train_step
from .vae_trainer import VAETrainConfig, create_vae_train_state, make_vae_train_step
