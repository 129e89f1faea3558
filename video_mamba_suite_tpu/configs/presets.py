"""Training presets mirroring the reference's published configurations.

Sources (all under /root/reference/video-mamba-suite/):
  TAL    temporal-action-localization/configs/mamba_thumos_new.yaml (+anet/
         hacs/fineaction variants)
  TAS    temporal-action-segmentation/main.py defaults (num_layers 10,
         f_maps 64, lr 5e-4, bz 1, 120 epochs, ASFormer schedule)
  VTG    video-temporal-grounding/main/config.py defaults + qvhighlights
         scripts
  DVC    video-dense-captioning/cfgs/anet_c3d_pdvc.yml family
  ANT    action-anticipation/src/.../config/defaults.py (LSTR memories)
  EGO    egocentric-understanding/scripts/pretrain (TimeMamba-B, 4f)
  REC    action-recognition/exp/k400/vivim_tiny/run_f16x224.sh
"""

from __future__ import annotations

from typing import Any, Dict

from ..utils.config import Config

PRESETS: Dict[str, Dict[str, Any]] = {
    # --- Temporal action localization: ActionMamba on THUMOS-14
    # (configs/mamba_thumos_new.yaml)
    "tal_thumos": dict(
        dataset=dict(
            num_classes=20, input_dim=3200, feat_stride=4, num_frames=16,
            trunc_thresh=0.5, crop_ratio=[0.9, 1.0], max_seq_len=2304,
            file_ext=".npy",
        ),
        model=dict(
            backbone_arch=[2, 2, 5], embd_dim=512, fpn_type="identity",
            mixer="dbm", scale_factor=2,
            regression_range=[[0, 4], [4, 8], [8, 16], [16, 32], [32, 64],
                              [64, 10000]],
        ),
        opt=dict(learning_rate=1e-4, epochs=45, weight_decay=0.05,
                 warmup_epochs=5, grad_clip=1.0, ema_decay=0.999),
        loader=dict(batch_size=2),
        train_cfg=dict(init_loss_norm=100, cls_prior_prob=0.01,
                       center_sample="radius", center_sample_radius=1.5,
                       droppath=0.1, label_smoothing=0.0),
        test_cfg=dict(voting_thresh=0.7, pre_nms_topk=2000, max_seg_num=200,
                      min_score=0.001, multiclass_nms=True, nms_sigma=0.5,
                      iou_threshold=0.1, nms_method="soft",
                      duration_thresh=0.05),
    ),
    # --- Temporal action segmentation: ASFormer-Mamba on GTEA
    # (main.py defaults; 50salads uses sample_rate=2)
    "tas_gtea": dict(
        model=dict(num_decoders=3, num_layers=10, num_f_maps=64,
                   input_dim=2048, channel_masking_rate=0.3, mixer="vim",
                   drop_path_rate=0.3),
        opt=dict(learning_rate=5e-4, weight_decay=1e-5, epochs=120),
        loader=dict(batch_size=1, sample_rate=1),
        dataset=dict(num_classes=11),
    ),
    # --- Video temporal grounding: UniVTG-Mamba on QVHighlights
    # (main/config.py + scripts/qvhl_pretrain_mamba.sh)
    "vtg_qvhighlights": dict(
        model=dict(embed_dim=1024, depth=6, mamba_type="dbm",
                   input_dropout=0.5, drop_path_rate=0.1,
                   max_q_l=32, max_v_l=75, clip_len=2.0),
        dataset=dict(v_feat_dim=2816, t_feat_dim=512),  # SlowFast+CLIP / CLIP
        opt=dict(learning_rate=1e-4, weight_decay=1e-4, epochs=200,
                 grad_clip=0.1),
        loader=dict(batch_size=32),
        loss=dict(loss_b=10.0, loss_g=1.0, loss_f=10.0, loss_s_inter=0.1,
                  loss_s_intra=0.1, eos_coef=0.1, temperature=0.07),
    ),
    # --- Dense captioning: PDVC-Mamba on ActivityNet C3D
    # (cfgs/anet_c3d_pdvc.yml family)
    "dvc_anet_c3d": dict(
        model=dict(d_model=512, num_queries=10, n_levels=4,
                   num_encoder_layers=2, num_decoder_layers=2,
                   max_eseq_length=10, max_caption_len=30, mixer="vim",
                   input_dim=500, num_classes=1,
                   # the published recipe's LSTM-DSA head
                   # (anet_c3d_pdvc.yml:4 caption_decoder_type: standard)
                   caption_decoder_type="standard"),
        opt=dict(learning_rate=5e-5, weight_decay=1e-4, epochs=30,
                 grad_clip=0.1),
        loader=dict(batch_size=1),
        loss=dict(count_weight=0.5, bbox_weight=5.0, giou_weight=2.0,
                  label_weight=2.0, caption_weight=1.0),
    ),
    # --- Dense captioning: PDVC-Mamba on YouCook2 TSN
    # (cfgs/yc2_tsn_pdvc.yml over yc2_tsn_pdvcl.yml)
    "dvc_yc2_tsn": dict(
        model=dict(d_model=512, num_queries=100, n_levels=4,
                   num_encoder_layers=2, num_decoder_layers=2,
                   max_eseq_length=10, max_caption_len=30, mixer="vim",
                   input_dim=3072, num_classes=1,
                   caption_decoder_type="standard"),
        opt=dict(learning_rate=5e-5, weight_decay=1e-4, epochs=30,
                 grad_clip=0.1),
        loader=dict(batch_size=1),
        loss=dict(count_weight=0.5, bbox_weight=5.0, giou_weight=2.0,
                  label_weight=2.0, caption_weight=1.0),
    ),
    # --- Action anticipation: TeSTra+Mamba on EK100
    # (config/defaults.py MODEL.LSTR)
    "anticipation_ek100": dict(
        model=dict(d_model=1024, mamba_layers=2,
                   long_memory_num_samples=512, work_memory_num_samples=32,
                   anticipation_num_samples=4, num_classes=3807,
                   dropout_cls=0.2),
        opt=dict(learning_rate=7e-5, weight_decay=5e-5, epochs=25),
        loader=dict(batch_size=16),
    ),
    # --- Egocentric CLIP pretrain: TimeMamba-B 4f on Ego4D
    # (scripts/pretrain + model_clip.py:721)
    "ego_timemamba_pretrain": dict(
        # scripts/pretrain/run_slurm_pretrain_bs512_timemamba_like_frozen.sh:
        # CLIP_TimeMamba_like_frozen = frozen-in-time + tanh-gated adapters
        # (the MODEL_ZOO zero-shot MIR row); set
        # model.attention_style=timesformer-div for the like_timesformer run
        model=dict(tower="timemamba", embed_dim=768, depth=12, num_heads=12,
                   num_frames=4, project_embed_dim=512, ln_pre=True,
                   attention_style="frozen-in-time", is_tanh_gating=True),
        opt=dict(learning_rate=3e-5, weight_decay=0.01, b2=0.98, epochs=5,
                 warmup_epochs=1),
        loader=dict(batch_size=256, context_length=77),
    ),
    # --- EK100 MIR finetune engine (scripts/mir_ft/*.sh →
    # main_lavila_finetune_mir.py defaults: lr 1e-5, wd 0.01, bs 64)
    "ego_ek100_mir": dict(
        train=dict(mode="mir"),
        model=dict(vision_tower="timemamba", embed_dim=512, depth=12,
                   num_frames=16, vision_width=768, is_tanh_gating=True),
        opt=dict(learning_rate=1e-5, weight_decay=0.01, epochs=10),
        loader=dict(batch_size=64, context_length=77),
    ),
    # --- EK100 CLS finetune engine (scripts/cls_ft/*.sh →
    # main_lavila_finetune_cls.py defaults: lr 1e-4, wd 0.05, smoothing 0.1)
    "ego_ek100_cls": dict(
        train=dict(mode="cls"),
        model=dict(embed_dim=192, depth=24, num_frames=16, patch_size=16,
                   img_size=224),
        dataset=dict(num_classes=3806),  # EK100 action classes
        opt=dict(learning_rate=1e-4, weight_decay=0.05, epochs=30),
        aug=dict(smoothing=0.1, mixup=0.8, cutmix=1.0),
        loader=dict(batch_size=32),
    ),
    # --- Action recognition: ViViM-T K400 finetune
    # (exp/k400/vivim_tiny/run_f16x224.sh)
    "recognition_k400_vivim_tiny": dict(
        model=dict(embed_dim=192, depth=24, num_frames=16, patch_size=16,
                   img_size=224, num_classes=400, drop_path_rate=0.1),
        opt=dict(learning_rate=1e-3, weight_decay=0.05, layer_decay=0.75,
                 epochs=30, warmup_epochs=5, ema_decay=0.9999),
        aug=dict(mixup=0.8, cutmix=1.0, smoothing=0.1,
                 # run_class_finetuning.py:95-113 defaults
                 aa="rand-m7-n4-mstd0.5-inc1", reprob=0.25, remode="pixel",
                 recount=1),
        loader=dict(batch_size=256),
        test=dict(num_temporal_views=4, num_spatial_views=3),
    ),
    # --- ViViM-S (vivim.py:543-585 registry: embed_dim 384, depth 24;
    # exp/k400/vivim_small/run_f16x224.sh recipe — same schedule as tiny)
    "recognition_k400_vivim_small": dict(
        model=dict(embed_dim=384, depth=24, num_frames=16, patch_size=16,
                   img_size=224, num_classes=400, drop_path_rate=0.1),
        opt=dict(learning_rate=1e-3, weight_decay=0.05, layer_decay=0.75,
                 epochs=30, warmup_epochs=5, ema_decay=0.9999),
        aug=dict(mixup=0.8, cutmix=1.0, smoothing=0.1,
                 aa="rand-m7-n4-mstd0.5-inc1", reprob=0.25, remode="pixel",
                 recount=1),
        loader=dict(batch_size=256),
        test=dict(num_temporal_views=4, num_spatial_views=3),
    ),
    # --- scan-norm mixer variant (vivim_scan_norm.py:503-545 registry)
    "recognition_k400_vivim_tiny_scan_norm": dict(
        model=dict(embed_dim=192, depth=24, num_frames=16, patch_size=16,
                   img_size=224, num_classes=400, drop_path_rate=0.1,
                   mixer="scan_norm"),
        opt=dict(learning_rate=1e-3, weight_decay=0.05, layer_decay=0.75,
                 epochs=30, warmup_epochs=5, ema_decay=0.9999),
        aug=dict(mixup=0.8, cutmix=1.0, smoothing=0.1,
                 aa="rand-m7-n4-mstd0.5-inc1", reprob=0.25, remode="pixel",
                 recount=1),
        loader=dict(batch_size=256),
        test=dict(num_temporal_views=4, num_spatial_views=3),
    ),
    # --- TAL dataset variants (README tables: ActivityNet/HACS/FineAction)
    "tal_anet": dict(
        dataset=dict(num_classes=1, input_dim=3200, feat_stride=16,
                     num_frames=16, max_seq_len=192, trunc_thresh=0.5,
                     crop_ratio=[0.9, 1.0]),
        model=dict(backbone_arch=[2, 2, 5], embd_dim=512,
                   fpn_type="identity", mixer="dbm", scale_factor=2),
        opt=dict(learning_rate=1e-3, epochs=15, weight_decay=0.05,
                 warmup_epochs=5, grad_clip=1.0, ema_decay=0.999),
        loader=dict(batch_size=16),
        test_cfg=dict(multiclass_nms=False, nms_sigma=0.75, max_seg_num=100,
                      voting_thresh=0.9, ext_score_fusion=True),
    ),
    "tal_hacs": dict(
        dataset=dict(num_classes=1, input_dim=3200, feat_stride=8,
                     num_frames=8, max_seq_len=960),
        model=dict(backbone_arch=[2, 2, 5], embd_dim=512,
                   fpn_type="identity", mixer="dbm", scale_factor=2),
        opt=dict(learning_rate=1e-3, epochs=15, weight_decay=0.05),
        loader=dict(batch_size=16),
        test_cfg=dict(multiclass_nms=False, ext_score_fusion=True),
    ),
    "tal_fineaction": dict(
        dataset=dict(num_classes=1, input_dim=1408, feat_stride=16,
                     num_frames=16, max_seq_len=192),
        model=dict(backbone_arch=[2, 2, 5], embd_dim=512,
                   fpn_type="identity", mixer="dbm", scale_factor=2),
        opt=dict(learning_rate=1e-3, epochs=20, weight_decay=0.05),
        loader=dict(batch_size=16),
        test_cfg=dict(multiclass_nms=False, ext_score_fusion=True),
    ),
    # --- TAS dataset variants
    "tas_50salads": dict(
        model=dict(num_decoders=3, num_layers=10, num_f_maps=64,
                   input_dim=2048, channel_masking_rate=0.3, mixer="vim"),
        opt=dict(learning_rate=5e-4, weight_decay=1e-5, epochs=120),
        loader=dict(batch_size=1, sample_rate=2),
        dataset=dict(num_classes=19),
    ),
    "tas_breakfast": dict(
        model=dict(num_decoders=3, num_layers=10, num_f_maps=64,
                   input_dim=2048, channel_masking_rate=0.3, mixer="vim"),
        opt=dict(learning_rate=5e-4, weight_decay=1e-5, epochs=120),
        loader=dict(batch_size=1, sample_rate=1),
        dataset=dict(num_classes=48),
    ),
    # --- VTG dataset variant
    "vtg_charades": dict(
        model=dict(embed_dim=1024, depth=6, mamba_type="dbm",
                   input_dropout=0.5, max_q_l=32, max_v_l=75, clip_len=1.0),
        dataset=dict(v_feat_dim=4096, t_feat_dim=512),
        opt=dict(learning_rate=1e-4, weight_decay=1e-4, epochs=100,
                 grad_clip=0.1),
        loader=dict(batch_size=32),
    ),
    # --- VTG dataset variants: TACoS + Ego4D-NLQ moment retrieval
    # (reference README tables; config.py dims — SlowFast+CLIP video feats)
    "vtg_tacos": dict(
        model=dict(embed_dim=1024, depth=6, mamba_type="dbm",
                   input_dropout=0.5, max_q_l=32, max_v_l=128, clip_len=2.0),
        dataset=dict(v_feat_dim=2816, t_feat_dim=512),
        opt=dict(learning_rate=1e-4, weight_decay=1e-4, epochs=100,
                 grad_clip=0.1),
        loader=dict(batch_size=32),
    ),
    "vtg_ego4d": dict(
        model=dict(embed_dim=1024, depth=6, mamba_type="dbm",
                   input_dropout=0.5, max_q_l=32, max_v_l=255, clip_len=2.0),
        dataset=dict(v_feat_dim=2304, t_feat_dim=512),  # EgoVLP/InternVideo
        opt=dict(learning_rate=1e-4, weight_decay=1e-4, epochs=100,
                 grad_clip=0.1),
        loader=dict(batch_size=32),
    ),
    # --- VTG highlight detection: TVSum (train_hl.py + config_hl.py;
    # saliency-only objective, per-domain splits, top-5 mAP protocol)
    "vtg_tvsum": dict(
        model=dict(embed_dim=1024, depth=6, mamba_type="dbm",
                   max_v_l=512, clip_len=2.0),
        dataset=dict(v_feat_dim=2816, t_feat_dim=512, domain="BK",
                     highlight=True),
        opt=dict(learning_rate=1e-4, weight_decay=1e-4, epochs=100,
                 grad_clip=0.1),
        loader=dict(batch_size=4),
        loss=dict(loss_f=4.0, loss_s_intra=0.1, eos_coef=0.1),
    ),
    # --- DVC dataset variant
    "dvc_yc2_tsn": dict(
        model=dict(d_model=512, num_queries=100, n_levels=4,
                   num_encoder_layers=2, num_decoder_layers=2,
                   max_eseq_length=20, max_caption_len=30, mixer="vim",
                   input_dim=3072, num_classes=1),
        opt=dict(learning_rate=5e-5, weight_decay=1e-4, epochs=30),
        loader=dict(batch_size=1),
    ),
}


def get_preset(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return Config(PRESETS[name])
