"""Utilities: logging, meters, EMA, profiling, compile-cache setup."""

from sp_gan_tpu.utils.meters import AverageValueMeter
from sp_gan_tpu.utils.cache import enable_compile_cache
from sp_gan_tpu.utils.watchdog import Watchdog

__all__ = ["AverageValueMeter", "enable_compile_cache", "Watchdog"]
