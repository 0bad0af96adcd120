"""Model factory (reference ``MLIC++/models/model_loader.py:4-18``)."""

from __future__ import annotations

from mlic_tpu.models.config import CONFIGS, ModelConfig, model_config
from mlic_tpu.models.mlicpp import MLICPlusPlus


def get_model(name: str) -> MLICPlusPlus:
    """Name -> constructed (uninitialized) Flax module."""
    cfg = model_config(name)
    if cfg.vbr:
        from mlic_tpu.models.vbr import MLICPlusPlusVbr
        return MLICPlusPlusVbr(cfg=cfg)
    return MLICPlusPlus(cfg=cfg)


__all__ = ["get_model", "model_config", "CONFIGS", "ModelConfig", "MLICPlusPlus"]
