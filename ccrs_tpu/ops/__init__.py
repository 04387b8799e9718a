"""Low-level device ops (Pallas TPU kernels + dispatch helpers)."""

from .threshold_pallas import adaptive_threshold_best, adaptive_threshold_pallas

__all__ = ["adaptive_threshold_best", "adaptive_threshold_pallas"]
