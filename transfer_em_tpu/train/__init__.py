from .cgan import (EM2EM, BoundModel, build_models, build_step_fn, create_prior_helper,
                   create_state, cyclegan_losses, make_scan_train_step,
                   make_train_step)
from .metrics import LOSS_NAMES, MetricsLogger, StepTimer, profile_trace
from .state import CycleGANState, make_optimizer

__all__ = [
    "EM2EM", "BoundModel", "build_models", "create_prior_helper", "create_state",
    "cyclegan_losses", "make_train_step", "make_scan_train_step", "CycleGANState", "make_optimizer",
    "LOSS_NAMES", "MetricsLogger", "StepTimer", "profile_trace",
]
