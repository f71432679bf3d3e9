#!/usr/bin/env python
"""Validation entry point (capability analog of the reference README's
root `val.py`: evaluate a trained checkpoint on a detection dataset).

    python val.py --data visdrone.yaml --weights runs/exp/weights/best.ckpt
"""

import argparse


def main():
    p = argparse.ArgumentParser(description="YOLO-SOD validation (TPU)")
    p.add_argument("--weights", required=True,
                   help="checkpoint (.ckpt) or model YAML")
    p.add_argument("--data", default="visdrone.yaml")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--rect", action="store_true",
                   help="aspect-bucket (rect) val batching")
    p.add_argument("--save-json", action="store_true",
                   help="also write COCO-format predictions json")
    args = p.parse_args()

    from yolo_sod_tpu import YOLO

    model = YOLO(args.weights)
    metrics = model.val(data=args.data, imgsz=args.imgsz, batch=args.batch,
                        conf=args.conf, iou=args.iou, rect=args.rect,
                        save_json=args.save_json)
    print(metrics)


if __name__ == "__main__":
    main()
