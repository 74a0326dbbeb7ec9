from .pyramid_pipeline import PyramidFlowPipeline
from .runner import PyramidFlowRunner
