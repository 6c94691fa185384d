from .categorical import CategoricalDiffusion  # noqa: F401
from .gaussian import GaussianDiffusion  # noqa: F401
from .ddim import DDIMParams, ddim_step  # noqa: F401
