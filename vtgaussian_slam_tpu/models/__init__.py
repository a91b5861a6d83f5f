from .gaussians import GaussianParams, GaussianVars, Section, CameraTrajectory
from . import gaussians
from .optimizer import AdamState, adam_init, adam_step
