"""Placeholder query module — populated in later milestones."""
