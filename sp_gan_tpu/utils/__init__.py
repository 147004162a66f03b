"""Utilities: logging, meters, EMA, profiling, compile-cache setup."""

from sp_gan_tpu.utils.meters import AverageValueMeter
from sp_gan_tpu.utils.cache import enable_compile_cache

__all__ = ["AverageValueMeter", "enable_compile_cache"]
