"""garmentnets-tpu: TPU-native GarmentNets.

Curated top-level API (lazily imported so data-only / host-only usage does
not pay the JAX import):

    from garmentnets_tpu import (
        PointNet2NOCS, PointNet2NOCSConfig,
        ConvImplicitWNFPipeline, PipelineConfig,
        ConvImplicitWNFDataModule, ConvImplicitWNFDataset,
        PredictEngine, Trainer,
    )
"""
from __future__ import annotations

__version__ = "0.2.0"

_LAZY = {
    "PointNet2NOCS": "garmentnets_tpu.models.pointnet2_nocs",
    "PointNet2NOCSConfig": "garmentnets_tpu.models.pointnet2_nocs",
    "ConvImplicitWNFPipeline": "garmentnets_tpu.models.pipeline",
    "PipelineConfig": "garmentnets_tpu.models.pipeline",
    "ConvImplicitWNFDataModule": "garmentnets_tpu.data.dataset",
    "ConvImplicitWNFDataset": "garmentnets_tpu.data.dataset",
    "Loader": "garmentnets_tpu.data.dataset",
    "PredictEngine": "garmentnets_tpu.harness.predict_engine",
    "PredictService": "garmentnets_tpu.harness.serve",
    "predict_remote": "garmentnets_tpu.harness.serve",
    "Trainer": "garmentnets_tpu.harness.training",
    "make_train_fns": "garmentnets_tpu.harness.training",
    "make_logger": "garmentnets_tpu.core.logging",
    "zarrlite": "garmentnets_tpu.data",
}

__all__ = sorted(_LAZY)


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module 'garmentnets_tpu' has no {name!r}")
    import importlib
    mod = importlib.import_module(target)
    if name == "zarrlite":
        from garmentnets_tpu.data import zarrlite as obj
    else:
        obj = getattr(mod, name)
    globals()[name] = obj
    return obj
