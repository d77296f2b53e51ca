from . import nnf, pytree
from .model import Model

__all__ = ["nnf", "pytree", "Model"]
