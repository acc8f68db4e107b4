"""Driver-side dataflow plans: config, templates, and the micro-batch
pipeline orchestration (SURVEY.md §2.1)."""

from .config import (BatcherConfig, EngineConfig, InitConfig, PipelineConfig,
                     RetryStrategy, StageConfig, StepConfig, TipTrackerConfig)
from .templates import TemplateSet, render_string

__all__ = [
    "BatcherConfig", "EngineConfig", "InitConfig", "PipelineConfig",
    "RetryStrategy", "StageConfig", "StepConfig", "TipTrackerConfig",
    "TemplateSet", "render_string",
]
