#!/usr/bin/env python
"""E1-E6 module-ablation sweep entry point.

Capability analog of the reference's root train_all.py: sequentially train
each ablation config (E1 = v12 3-scale baseline, E2 = +P2, E3 = +SE,
E4 = +CBAM, E5 = +Swin, E6 = +A2) under one shared hyperparameter set, with
the delayed-P2 curriculum on every config that has a P2 scale (reference
train_all.py: run_one + cb_p2_gate; module registration and YAML shims are
unnecessary here — the registry is static and our configs are clean).

    python train_all.py --data visdrone.yaml --epochs 400 --batch 10
"""

import argparse
from pathlib import Path

EXPERIMENTS = [
    ("E1_v12_baseline", "E1.yaml"),
    ("E2_v5_P2", "E2.yaml"),
    ("E3_v5_P2_SE", "E3.yaml"),
    ("E4_v5_P2_SE_CBAM", "E4.yaml"),
    ("E5_v5_P2_SE_CBAM_Swin", "E5.yaml"),
    ("E6_v5_P2_SE_CBAM_Swin_A2", "E6.yaml"),
]


def run_one(exp_name: str, cfg_path: str, args) -> None:
    """Train one ablation config (reference train_all.py run_one)."""
    from yolo_sod_tpu import YOLO
    from yolo_sod_tpu.engine.staged import create_p2_toggle_callback
    from yolo_sod_tpu.utils import LOGGER

    model = YOLO(cfg_path)
    # The gate callback self-selects: it only acts on DetectStable heads, and
    # a 3-scale head (E1) never has its P2 slot masked, so registering it
    # unconditionally matches the reference's use_p2_gate=True behavior.
    if args.close_p2_until > 0:
        model.add_callback("on_train_epoch_start",
                           create_p2_toggle_callback(args.close_p2_until))

    LOGGER.info(f"--- ablation {exp_name}: cfg={cfg_path} "
                f"p2_delay={args.close_p2_until} ---")
    model.train(data=args.data, epochs=args.epochs, imgsz=args.imgsz,
                batch=args.batch, project=args.project, name=exp_name,
                workers=args.workers, lr0=args.lr, momentum=0.937,
                weight_decay=0.0005, patience=7, save_period=10,
                seed=args.seed)
    LOGGER.info(f"--- ablation {exp_name}: done ---")


def main():
    p = argparse.ArgumentParser(description="YOLO-SOD E1-E6 ablation sweep (TPU)")
    p.add_argument("--data", default="visdrone.yaml")
    p.add_argument("--cfg_dir", default=None,
                   help="directory holding E1-E6 YAMLs (default: bundled cfg/models)")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--project", default="runs/ablation-1")
    p.add_argument("--close_p2_until", type=int, default=30,
                   help="epochs to keep the P2 scale masked (DetectStable only)")
    p.add_argument("--only", default=None,
                   help="comma-separated subset, e.g. 'E2,E5'")
    args = p.parse_args()

    from yolo_sod_tpu.utils import LOGGER

    only = {s.strip() for s in args.only.split(",")} if args.only else None
    for exp_name, yaml_name in EXPERIMENTS:
        if only and yaml_name.split(".")[0] not in only:
            continue
        cfg_path = (str(Path(args.cfg_dir) / yaml_name) if args.cfg_dir
                    else yaml_name)
        if args.cfg_dir and not Path(cfg_path).exists():
            LOGGER.error(f"config not found, skipping '{exp_name}': {cfg_path}")
            continue
        run_one(exp_name, cfg_path, args)


if __name__ == "__main__":
    main()
