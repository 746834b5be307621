"""Composed end-to-end plans (the reference's two topologies, fused)."""

from .rosetta import calls_aggregation_plan, enriched_calls_plan

__all__ = ["calls_aggregation_plan", "enriched_calls_plan"]
