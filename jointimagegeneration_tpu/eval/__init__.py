from .metrics import (  # noqa: F401
    confusion_matrix,
    dice_from_confusion,
    per_class_dice,
    per_class_precision_recall,
    generalized_energy_distance,
    hungarian_matched_iou,
    frechet_distance,
)
