from .classes import ABD_ORGAN_CLASSES, NUM_CLASSES, class_color_map  # noqa: F401
from .nifti import read_nifti, write_nifti  # noqa: F401
