#!/usr/bin/env python
"""Single-stage training entry point (capability analog of the reference's
root train.py: argparse front end over the trainer; module registration and
YAML-robustness shims are unnecessary here — the registry is static and our
configs are clean).

    python train.py --cfg yolov12-sod-fusion-v5-simple.yaml \
        --data visdrone.yaml --epochs 500 --batch 16 --imgsz 640
"""

import argparse


def main():
    p = argparse.ArgumentParser(description="YOLO-SOD training (TPU)")
    p.add_argument("--cfg", default="yolov12-sod-fusion-v5-simple.yaml")
    p.add_argument("--data", default="visdrone.yaml")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--lr0", type=float, default=None)
    p.add_argument("--optimizer", default="auto")
    p.add_argument("--name", default="exp")
    p.add_argument("--project", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--cache", action="store_true")
    args = p.parse_args()

    from yolo_sod_tpu import YOLO

    model = YOLO(args.cfg)
    overrides = dict(data=args.data, epochs=args.epochs, batch=args.batch,
                     imgsz=args.imgsz, optimizer=args.optimizer,
                     name=args.name, cache=args.cache)
    if args.lr0 is not None:
        overrides["lr0"] = args.lr0
    if args.project:
        overrides["project"] = args.project
    if args.resume:
        overrides["resume"] = args.resume
    metrics = model.train(**overrides)
    if metrics is not None:
        print(metrics)


if __name__ == "__main__":
    main()
