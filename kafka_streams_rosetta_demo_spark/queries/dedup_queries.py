"""Placeholder — filled in later milestones."""
