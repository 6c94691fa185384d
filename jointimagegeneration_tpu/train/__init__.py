from .state import EMATrainState  # noqa: F401
from .optim import build_optimizer  # noqa: F401
from .steps import make_mask_train_step, make_ldm_train_step, make_latent_ldm_train_step  # noqa: F401
