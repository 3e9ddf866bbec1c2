from .money import cents, exact_ratio

__all__ = ["cents", "exact_ratio"]
