from .pipeline import PipelineDAG, Stage
from .medallion import MedallionPipeline

__all__ = ["PipelineDAG", "Stage", "MedallionPipeline"]
