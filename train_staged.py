#!/usr/bin/env python
"""Staged HCP-400 curriculum training entry point.

Capability analog of the reference's root train_yolov12_staged.py: 4-stage
hyperparameter protocol + delayed P2 activation on the SOD fusion model.

    python train_staged.py --cfg yolov12-sod-fusion-v5.yaml \
        --data visdrone.yaml --epochs 400 --batch 16 --imgsz 640
"""

import argparse


def main():
    p = argparse.ArgumentParser(description="YOLO-SOD staged training (TPU)")
    p.add_argument("--cfg", default="yolov12-sod-fusion-v5.yaml")
    p.add_argument("--data", default="visdrone.yaml")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--close-p2-until", type=int, default=30,
                   help="epochs to keep the P2 scale masked (DetectStable)")
    p.add_argument("--name", default="yolov12_sod_staged")
    p.add_argument("--project", default=None)
    args = p.parse_args()

    from yolo_sod_tpu.engine.staged import train_staged

    metrics = train_staged(cfg=args.cfg, data=args.data, epochs=args.epochs,
                           batch=args.batch, imgsz=args.imgsz,
                           close_p2_until=args.close_p2_until,
                           name=args.name,
                           **({"project": args.project} if args.project else {}))
    if metrics is not None:
        print(metrics)


if __name__ == "__main__":
    main()
