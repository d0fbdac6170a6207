"""Auxiliary subsystems: configuration, tracing/profiling, quality metrics.

The reference has none of these (SURVEY.md §5: no timers, no logging, no
config system — all configuration is per-call arguments, hap.h:98-104);
here they are first-class since the framework targets production serving.
"""

from hap_tpu.utils.config import EncodeConfig
from hap_tpu.utils.tracing import device_timer, trace
from hap_tpu.utils.quality import psnr, relative_rmse

__all__ = ["EncodeConfig", "device_timer", "trace", "psnr", "relative_rmse"]
