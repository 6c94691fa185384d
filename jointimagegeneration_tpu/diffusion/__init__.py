from .categorical import CategoricalDiffusion  # noqa: F401
from .gaussian import GaussianDiffusion  # noqa: F401
from .ddim import DDIMParams, ddim_step  # noqa: F401
from .dpm_solver import dpm_solver_sample_loop  # noqa: F401
from .plms import plms_sample_loop  # noqa: F401
