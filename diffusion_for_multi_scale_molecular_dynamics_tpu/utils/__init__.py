"""Support utilities: configuration, logging, reproducibility, profiling, restore."""
