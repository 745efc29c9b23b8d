"""Config-dict -> model-config builders (and back, for checkpoint hparams).

The reference embeds ctor kwargs in checkpoints via save_hyperparameters;
these builders give the same property: a checkpoint's hparams dict fully
reconstructs the model (load_from_checkpoint parity, SURVEY.md §5).
"""
from __future__ import annotations

from garmentnets_tpu.models.pointnet2_nocs import PointNet2NOCSConfig
from garmentnets_tpu.models.pipeline import PipelineConfig

_PN2_KEYS = ("feature_dim", "batch_norm", "dropout", "sa1_ratio", "sa1_r",
             "sa2_ratio", "sa2_r", "fp3_k", "fp2_k", "fp1_k", "nocs_bins",
             "symmetry_axis", "learning_rate", "nocs_loss_weight",
             "grip_point_loss_weight")


def build_pointnet2_config(model_cfg: dict) -> PointNet2NOCSConfig:
    kwargs = {k: model_cfg[k] for k in _PN2_KEYS if k in model_cfg}
    return PointNet2NOCSConfig(**kwargs)


def pointnet2_hparams(cfg: PointNet2NOCSConfig) -> dict:
    return {k: getattr(cfg, k) for k in _PN2_KEYS}


def build_pipeline_config(conv_cfg: dict,
                          pointnet2_cfg: PointNet2NOCSConfig
                          ) -> PipelineConfig:
    """conv_cfg: the `conv_implicit_model` block of train_pipeline config
    (reference schema, config/train_pipeline_default.yaml:39-74)."""
    agg = conv_cfg["volume_agg_params"]
    unet = conv_cfg["unet3d_params"]
    return PipelineConfig(
        pointnet2=pointnet2_cfg,
        volume_agg_nn_channels=tuple(agg["nn_channels"]),
        volume_agg_batch_norm=agg.get("batch_norm", True),
        grid_shape=tuple(agg.get("grid_shape", (32, 32, 32))),
        reduce_method=agg.get("reduce_method", "max"),
        include_point_feature=agg.get("include_point_feature", True),
        include_confidence_feature=agg.get(
            "include_confidence_feature", True),
        unet_in_channels=unet["in_channels"],
        unet_out_channels=unet["out_channels"],
        unet_f_maps=unet.get("f_maps", 32),
        unet_layer_order=unet.get("layer_order", "gcr"),
        unet_num_groups=unet.get("num_groups", 8),
        unet_num_levels=unet.get("num_levels", 4),
        volume_decoder_channels=tuple(
            conv_cfg["volume_decoder_params"]["nn_channels"]),
        surface_decoder_channels=tuple(
            conv_cfg["surface_decoder_params"]["nn_channels"]),
        mc_surface_decoder_channels=tuple(
            conv_cfg.get("mc_surface_decoder_params",
                         {"nn_channels": (128, 256, 256, 1)})["nn_channels"]),
        decoder_batch_norm=conv_cfg["volume_decoder_params"].get(
            "batch_norm", True),
        learning_rate=conv_cfg.get("learning_rate", 1e-4),
        loss_type=conv_cfg.get("loss_type", "l2"),
        volume_loss_weight=conv_cfg.get("volume_loss_weight", 1.0),
        surface_loss_weight=conv_cfg.get("surface_loss_weight", 1.0),
        mc_surface_loss_weight=conv_cfg.get("mc_surface_loss_weight", 0.0),
        volume_classification=conv_cfg.get("volume_classification", False),
        volume_task_space=conv_cfg.get("volume_task_space", False),
    )


def pipeline_hparams(cfg: PipelineConfig) -> dict:
    """Serialize PipelineConfig back into the reference's nested schema."""
    return {
        "pointnet2_params": pointnet2_hparams(cfg.pointnet2),
        "volume_agg_params": {
            "nn_channels": list(cfg.volume_agg_nn_channels),
            "batch_norm": cfg.volume_agg_batch_norm,
            "grid_shape": list(cfg.grid_shape),
            "reduce_method": cfg.reduce_method,
            "include_point_feature": cfg.include_point_feature,
            "include_confidence_feature": cfg.include_confidence_feature,
        },
        "unet3d_params": {
            "in_channels": cfg.unet_in_channels,
            "out_channels": cfg.unet_out_channels,
            "f_maps": cfg.unet_f_maps,
            "layer_order": cfg.unet_layer_order,
            "num_groups": cfg.unet_num_groups,
            "num_levels": cfg.unet_num_levels,
        },
        "volume_decoder_params": {
            "nn_channels": list(cfg.volume_decoder_channels),
            "batch_norm": cfg.decoder_batch_norm,
        },
        "surface_decoder_params": {
            "nn_channels": list(cfg.surface_decoder_channels),
            "batch_norm": cfg.decoder_batch_norm,
        },
        "mc_surface_decoder_params": {
            "nn_channels": list(cfg.mc_surface_decoder_channels),
            "batch_norm": cfg.decoder_batch_norm,
        },
        "learning_rate": cfg.learning_rate,
        "loss_type": cfg.loss_type,
        "volume_loss_weight": cfg.volume_loss_weight,
        "surface_loss_weight": cfg.surface_loss_weight,
        "mc_surface_loss_weight": cfg.mc_surface_loss_weight,
        "volume_classification": cfg.volume_classification,
        "volume_task_space": cfg.volume_task_space,
    }


def pipeline_config_from_hparams(hp: dict) -> PipelineConfig:
    pn2 = build_pointnet2_config(hp["pointnet2_params"])
    return build_pipeline_config(hp, pn2)
