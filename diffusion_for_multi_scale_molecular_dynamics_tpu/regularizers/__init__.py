"""Auxiliary training losses: Fokker-Planck, consistency, regression."""

from .regularizer import Regularizer, RegularizerParameters
from .regularizer_factory import create_regularizer, create_regularizer_parameters

__all__ = [
    "Regularizer",
    "RegularizerParameters",
    "create_regularizer",
    "create_regularizer_parameters",
]
