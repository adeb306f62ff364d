"""Structured Streaming CDC pipeline (SURVEY.md §2.8)."""

from kahi_spark.streaming.pipeline import CdcPipeline

__all__ = ["CdcPipeline"]
