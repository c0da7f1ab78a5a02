"""Optimal-transport alignment of noised and reference configurations."""

from .transporter import Transporter, get_geodesic_displacements

__all__ = ["Transporter", "get_geodesic_displacements"]
