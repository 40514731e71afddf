from .diffusion_matching import DiffusionMatchingModel, PipelineConfig

__all__ = ["DiffusionMatchingModel", "PipelineConfig"]
