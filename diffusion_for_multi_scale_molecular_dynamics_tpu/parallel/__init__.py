"""Device-mesh sharding for data-parallel training and sample-parallel generation."""
