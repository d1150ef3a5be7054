from svgf_tpu.kernels.atrous_pallas import atrous_iteration_pallas

__all__ = ["atrous_iteration_pallas"]
