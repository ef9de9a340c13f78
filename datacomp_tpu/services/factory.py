"""Backend selection (parity: ``service/ServiceFactory.java:21-70``):
force_cpu → CPU; otherwise probe the TPU service and fall back to CPU on any
failure."""

from __future__ import annotations

import logging
from typing import Optional

from ..config import AppConfig, load_config
from .base import CompressionService, FrequencyService
from .cpu_service import CpuCompressionService, CpuFrequencyService

logger = logging.getLogger(__name__)


def create_compression_service(
    config: Optional[AppConfig] = None, force_cpu: Optional[bool] = None
) -> CompressionService:
    config = config or load_config()
    if force_cpu if force_cpu is not None else config.device.force_cpu:
        logger.info("Using CPU compression service (forced)")
        return CpuCompressionService(config)
    if config.device.auto_detect:
        try:
            from .tpu_service import TpuCompressionService

            svc = TpuCompressionService(config)
            if svc.is_available():
                logger.info("Using TPU compression service")
                return svc
            svc.close()
            logger.warning("TPU probe failed; using CPU compression service")
        except Exception as e:  # noqa: BLE001 — reference parity: any init failure ⇒ CPU
            logger.warning("TPU service init failed (%s); using CPU", e)
    return CpuCompressionService(config)


def create_frequency_service(
    config: Optional[AppConfig] = None, force_cpu: Optional[bool] = None
) -> FrequencyService:
    config = config or load_config()
    if force_cpu if force_cpu is not None else config.device.force_cpu:
        return CpuFrequencyService()
    try:
        from .tpu_service import TpuFrequencyService

        svc = TpuFrequencyService(config)
        if svc.is_available():
            return svc
    except Exception as e:  # noqa: BLE001
        logger.warning("TPU frequency service init failed (%s); using CPU", e)
    return CpuFrequencyService()
