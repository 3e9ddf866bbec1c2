from .money import cents, exact_ratio
from . import hashing, parsing, postal  # noqa: F401

__all__ = ["cents", "exact_ratio", "hashing", "parsing", "postal"]
