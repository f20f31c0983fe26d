"""Pipeline plans: parse→enrich→route→aggregate + checkpoint manifest."""

from .pipeline import PipelineConfig, PipelineResult, run_pipeline, enriched_turns
from . import manifest

__all__ = ["PipelineConfig", "PipelineResult", "run_pipeline",
           "enriched_turns", "manifest"]
