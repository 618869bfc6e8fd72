from .pipeline import PipelineStats, run_pipeline

__all__ = ["PipelineStats", "run_pipeline"]
