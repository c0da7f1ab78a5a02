"""Offline analysis: score viewer, trajectory export, OVITO utilities."""
