from .denoise import denoise, soft_threshold, hard_threshold
from .cs_recon import fista_cs_mri, ista_step

__all__ = [
    "denoise",
    "soft_threshold",
    "hard_threshold",
    "fista_cs_mri",
    "ista_step",
]
