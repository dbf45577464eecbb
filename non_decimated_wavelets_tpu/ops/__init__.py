from .fft_path import dec_fft, rec_fft
from .direct_path import dec_direct, rec_direct

__all__ = ["dec_fft", "rec_fft", "dec_direct", "rec_direct"]
