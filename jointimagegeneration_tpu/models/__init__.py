from .mask_sampler import MaskSampler  # noqa: F401
from .slice_ldm import SliceLDM  # noqa: F401
