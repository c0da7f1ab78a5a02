"""Batch sampling drivers and validation-time sampling with KS metrics."""
