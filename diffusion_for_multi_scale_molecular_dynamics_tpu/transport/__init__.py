from .transporter import Transporter, get_geodesic_displacements

__all__ = ["Transporter", "get_geodesic_displacements"]
