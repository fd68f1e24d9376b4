from .deterministic import davg, dsum
from .scalar import register_scalar_functions

__all__ = ["dsum", "davg", "register_scalar_functions"]
