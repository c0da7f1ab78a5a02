"""Core math kernels: geometry, neighbors, wrapped-Gaussian score, D3PM algebra."""
