from .cgan import EM2EM, build_models, create_state, cyclegan_losses, make_train_step
from .state import CycleGANState, make_optimizer

__all__ = [
    "EM2EM", "build_models", "create_state", "cyclegan_losses",
    "make_train_step", "CycleGANState", "make_optimizer",
]
