from .two_stage import TwoStagePipeline, upsample_labels  # noqa: F401
