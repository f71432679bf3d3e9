"""Synthetic small-object-detection convergence benchmark (the rebuild's
analog of the reference's E1-E6 ablation, runs/ablation-1/*/results.csv and
README.md:107-116).

The real VisDrone/UAVVaste datasets are not in this image, so this builds a
VisDrone-*shaped* synthetic set sized to be fair to the 13.5 M-param flagship:
hundreds of images, 10 classes, dense scenes (25-55 objects/img), and a box
size distribution skewed tiny the way VisDrone's is. The physics that makes
P2 matter is anchor coverage: at train scale, a box smaller than one stride-8
cell contains a stride-8 anchor center only (s/8)^2 of the time — most tiny
GTs get NO positive stride-8 assignment (TAL's select_candidates_in_gts
requires the center inside the box) and are unlearnable for a P3-P5 model,
while stride-4 anchors cover every >=4 px box. Source images are 480^2 and
training runs at 320 (source != imgsz, the r4 letterbox-regression
configuration), so the tiny fraction lands either side of the stride-8 cell.

Classes are (color, glyph) pairs on cluttered gray backgrounds with colored
distractor blobs — learnable at tiny sizes (color survives downsampling),
but localization recall is gated by anchor coverage, which is the SOD claim
under test.

Usage:
    python tools/sod_benchmark.py gen  [--root DIR]
    python tools/sod_benchmark.py train --model {yolov12n,E1,flagship} [...]
    python tools/sod_benchmark.py report [--root DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_ROOT = Path("/root/repo/runs/sod_bench")

# 10 classes: (name, BGR color, glyph). Colors are mutually far in RGB so the
# class cue survives 6 px rasterization; glyphs add a shape cue at larger
# sizes (VisDrone classes are likewise separable-but-degraded when tiny).
CLASSES = [
    ("red_disc", (40, 40, 230), "disc"),
    ("green_disc", (60, 200, 60), "disc"),
    ("blue_disc", (230, 80, 40), "disc"),
    ("yellow_sq", (40, 220, 230), "square"),
    ("cyan_sq", (220, 220, 50), "square"),
    ("magenta_sq", (220, 60, 220), "square"),
    ("orange_tri", (30, 140, 255), "tri"),
    ("white_ring", (245, 245, 245), "ring"),
    ("purple_cross", (200, 60, 130), "cross"),
    ("lime_tri", (80, 255, 180), "tri"),
]


def _draw_glyph(img, cx, cy, w, h, color, glyph, rng):
    import cv2

    x1, y1 = int(round(cx - w / 2)), int(round(cy - h / 2))
    x2, y2 = int(round(cx + w / 2)), int(round(cy + h / 2))
    if glyph == "disc":
        cv2.ellipse(img, (int(cx), int(cy)), (max(1, int(w / 2)), max(1, int(h / 2))),
                    0, 0, 360, color, -1)
    elif glyph == "square":
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif glyph == "tri":
        pts = np.array([[int(cx), y1], [x1, y2], [x2, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    elif glyph == "ring":
        r = max(2, int(min(w, h) / 2))
        cv2.circle(img, (int(cx), int(cy)), r, color, max(1, r // 3))
    elif glyph == "cross":
        t = max(1, int(min(w, h) / 4))
        cv2.rectangle(img, (x1, int(cy - t / 2)), (x2, int(cy + t / 2)), color, -1)
        cv2.rectangle(img, (int(cx - t / 2), y1), (int(cx + t / 2), y2), color, -1)


def _background(src: int, rng) -> np.ndarray:
    """Cluttered gray scene: blurred noise + building-ish blocks + road lines."""
    import cv2

    base = rng.integers(70, 110)
    img = rng.normal(base, 12, (src, src, 3)).clip(0, 255).astype(np.uint8)
    img = cv2.GaussianBlur(img, (7, 7), 0)
    for _ in range(int(rng.integers(6, 14))):       # blocks (buildings/fields)
        w, h = rng.integers(40, 160, 2)
        x, y = rng.integers(0, src - 20, 2)
        g = int(rng.integers(50, 140))
        tint = np.array([g, g, g]) + rng.integers(-18, 18, 3)
        cv2.rectangle(img, (x, y), (min(src - 1, x + w), min(src - 1, y + h)),
                      tuple(int(c) for c in tint.clip(0, 255)), -1)
    for _ in range(int(rng.integers(2, 5))):        # roads
        p0 = tuple(int(v) for v in rng.integers(0, src, 2))
        p1 = tuple(int(v) for v in rng.integers(0, src, 2))
        cv2.line(img, p0, p1, (int(rng.integers(120, 160)),) * 3,
                 int(rng.integers(6, 14)))
    img = cv2.GaussianBlur(img, (3, 3), 0)
    # dull distractor blobs (non-class colors: desaturated olives/browns)
    for _ in range(int(rng.integers(8, 20))):
        c = tuple(int(v) for v in rng.integers(40, 120, 3))
        cx, cy = rng.integers(8, src - 8, 2)
        r = int(rng.integers(2, 7))
        cv2.circle(img, (int(cx), int(cy)), r, c, -1)
    return img


def make_sod_dataset(root: Path, n_train: int = 320, n_val: int = 96,
                     src: int = 480, seed: int = 7) -> Path:
    """Write the benchmark dataset; returns the dataset yaml path.

    Box widths at source: 88% log-uniform in [7, 26] px, 12% in [30, 64] px
    (the VisDrone small-heavy mix with a few vehicles); aspect U(0.65, 1.55).
    At imgsz=320 (scale 2/3) the tiny mode spans 4.7-17 px — most of it under
    the 8 px stride-8 cell.
    """
    import cv2

    rng = np.random.default_rng(seed)
    for split, n_images in (("train", n_train), ("val", n_val)):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            img = _background(src, rng)
            occupied = np.zeros((src, src), bool)
            rows = []
            for _ in range(int(rng.integers(25, 56))):
                c = int(rng.integers(0, len(CLASSES)))
                name, color, glyph = CLASSES[c]
                if rng.random() < 0.88:
                    w = float(np.exp(rng.uniform(np.log(7.0), np.log(26.0))))
                else:
                    w = float(rng.uniform(30.0, 64.0))
                h = w * float(rng.uniform(0.65, 1.55))
                ok = False
                for _try in range(25):
                    cx = rng.uniform(w / 2 + 2, src - w / 2 - 2)
                    cy = rng.uniform(h / 2 + 2, src - h / 2 - 2)
                    x1, y1 = int(cx - w / 2), int(cy - h / 2)
                    x2, y2 = int(np.ceil(cx + w / 2)), int(np.ceil(cy + h / 2))
                    if not occupied[y1:y2, x1:x2].any():
                        ok = True
                        break
                if not ok:
                    continue
                occupied[max(0, y1 - 2):y2 + 2, max(0, x1 - 2):x2 + 2] = True
                jit = rng.integers(-18, 18, 3)
                col = tuple(int(np.clip(color[k] + jit[k], 0, 255)) for k in range(3))
                _draw_glyph(img, cx, cy, w, h, col, glyph, rng)
                rows.append(f"{c} {cx / src:.6f} {cy / src:.6f} "
                            f"{w / src:.6f} {h / src:.6f}")
            # global photometric jitter so nets must generalize
            gain = rng.uniform(0.85, 1.15)
            img = (img.astype(np.float32) * gain).clip(0, 255).astype(np.uint8)
            cv2.imwrite(str(root / "images" / split / f"{i:04d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 92])
            (root / "labels" / split / f"{i:04d}.txt").write_text("\n".join(rows))
    names = "\n".join(f"  {i}: {c[0]}" for i, c in enumerate(CLASSES))
    yaml_path = root / "data.yaml"
    yaml_path.write_text(f"path: {root}\ntrain: images/train\nval: images/val\n"
                         f"names:\n{names}\n")
    # size-distribution audit for the PERF table
    sizes = []
    for f in (root / "labels" / "train").glob("*.txt"):
        for line in f.read_text().splitlines():
            p = line.split()
            sizes.append(max(float(p[3]), float(p[4])) * src)
    sizes = np.array(sizes)
    stats = {"n_boxes_train": int(sizes.size),
             "px_at_src": {"p10": round(float(np.percentile(sizes, 10)), 1),
                           "p50": round(float(np.percentile(sizes, 50)), 1),
                           "p90": round(float(np.percentile(sizes, 90)), 1)},
             "frac_below_stride8_cell_at_320":
                 round(float((sizes * 320 / src < 8).mean()), 3),
             "frac_below_12px_at_320":
                 round(float((sizes * 320 / src < 12).mean()), 3)}
    (root / "stats.json").write_text(json.dumps(stats, indent=1))
    print(json.dumps(stats))
    return yaml_path


# ---------------------------------------------------------------------------
RUNS = {
    # name -> (cfg, staged?)  — recipes below in train_one
    "yolov12n": ("yolov12n.yaml", False),
    "E1": ("E1.yaml", False),
    "flagship": ("yolov12-sod-fusion-v5-simple-staged.yaml", True),
}


def train_one(model_key: str, root: Path, imgsz: int, epochs: int, batch: int,
              resume: bool = False, close_p2_until: int = 20,
              staged_lr: str = "effective", lr0: float = None,
              patience: int = None, optimizer: str = None) -> None:
    """One training leg. Baselines get the reference's stock single-stage
    recipe (SURVEY §6 golden args, SGD lr0 0.01 linear decay); the flagship
    gets the HCP staged protocol (stage hyp mutations + DetectStable P2
    gate + early-phase guard), reference train_yolov12_staged.py:81-218.

    staged_lr selects which lr semantics the stage switch uses:

    * "literal"   — the stage lr0 values persist (what the staged CONFIG
      says: 1e-3 from epoch 50, 6e-4 from 150, 3e-4 from 350).
    * "effective" — stage switches mutate AUGMENTATION only and lr stays on
      the stock SGD 0.01 linear decay. This is what the reference's
      committed 27.5-mAP runs actually did: their callback writes
      pg['lr'], but ultralytics' LambdaLR scheduler recomputes lr from the
      captured lr0 at the next epoch step, so each stage's lr assignment
      lasted ONE epoch (reference train_yolov12_staged.py:190-193 vs
      ultralytics trainer._setup_scheduler) — on top of the P2 gate being
      a no-op on their plain-Detect config (SURVEY §2.1). Measured here
      (PERF.md round-5): the literal schedule starves the 13.5 M flagship
      (mAP50-95 0.45 @ epoch 175 vs baselines' 0.70 at the same point);
      the effective protocol is the one that reproduces the headline.
    """
    cfg, staged = RUNS[model_key]
    data = str(root / "data.yaml")
    project = str(root / "runs")
    common = dict(data=data, epochs=epochs, imgsz=imgsz, batch=batch,
                  project=project, name=model_key, exist_ok=True,
                  patience=patience if patience is not None else 50,
                  save_period=25, seed=0, workers=4,
                  cache="ram", val_period=3)
    if resume:
        common["resume"] = str(Path(project) / model_key / "weights" / "last.ckpt")
    t0 = time.perf_counter()
    if staged:
        from yolo_sod_tpu.engine.staged import (create_early_phase_callback,
                                                create_hcp_400_config,
                                                create_p2_toggle_callback,
                                                create_staged_training_callback)
        from yolo_sod_tpu.engine.trainer import DetectionTrainer
        from yolo_sod_tpu import YOLO

        model = YOLO(cfg)
        stages = create_hcp_400_config()
        if staged_lr == "effective":
            # Strip lr0 from the stage dicts: the reference's stage lr
            # writes were undone by its scheduler every epoch (docstring) —
            # the headline-reproducing schedule is stock SGD 0.01 linear
            # decay with staged AUGMENTATION mutations only.
            stages = {k: {kk: vv for kk, vv in v.items() if kk != "lr0"}
                      for k, v in stages.items()}
        # lr0=0.01, NOT stage1's 0.002: the reference's committed headline
        # runs used optimizer=auto, which resolves to SGD lr 0.01 and IGNORES
        # the configured lr0 (SURVEY §6 golden recipe).
        # optimizer: the reference default is "auto" (cfg/default.yaml),
        # whose rule picks AdamW(lr=0.002*5/(4+nc)) below 10k total
        # iterations and SGD 0.01 above (reference trainer.py:779-788). The
        # VisDrone headline resolved to SGD (>250k iters); THIS benchmark's
        # ~6k iters resolve to AdamW — forcing SGD here is exactly the
        # small-data misconfiguration the auto rule exists to prevent
        # (measured: SGD 0.01 is val-unstable for the flagship, 0.005
        # converges ~3x slower than the baselines; PERF.md round-5).
        opt = optimizer if optimizer else ("SGD" if lr0 is not None else "auto")
        trainer = DetectionTrainer(
            overrides={**model.overrides, **common, "mode": "train",
                       **({"lr0": lr0} if lr0 is not None else {}),
                       "optimizer": opt},
            model=model.model)
        trainer.add_callback("on_train_epoch_start",
                             create_staged_training_callback(stages))
        trainer.add_callback("on_train_epoch_start",
                             create_p2_toggle_callback(close_p2_until))
        trainer.add_callback("on_train_epoch_end", create_early_phase_callback())
        trainer.train()
        metrics = trainer.metrics
    else:
        from yolo_sod_tpu import YOLO

        model = YOLO(cfg)
        metrics = model.train(optimizer="SGD", lr0=0.01, momentum=0.937,
                              weight_decay=0.0005, **common)
    wall = time.perf_counter() - t0
    md = metrics.results_dict if hasattr(metrics, "results_dict") else dict(metrics or {})
    out = {"model": model_key, "cfg": cfg, "staged": staged, "epochs": epochs,
           "imgsz": imgsz, "wall_s": round(wall, 1), "resumed": resume,
           "metrics": {k: round(float(v), 4) for k, v in md.items()
                       if isinstance(v, (int, float))}}
    res = Path(project) / model_key / "final.json"
    res.write_text(json.dumps(out, indent=1))
    print("RESULT " + json.dumps(out))


def report(root: Path) -> None:
    """Best-epoch table from each run's results.csv + final.json."""
    import csv as _csv

    rows = []
    for key in RUNS:
        run = root / "runs" / key
        entry = {"model": key}
        f = run / "final.json"
        if f.exists():
            entry.update(json.loads(f.read_text()))
        rc = run / "results.csv"
        if rc.exists():
            best = None
            with open(rc) as fh:
                for r in _csv.DictReader(fh):
                    m = r.get("metrics/mAP50-95(B)") or ""
                    if m.strip():
                        v = float(m)
                        if best is None or v > best[0]:
                            best = (v, float(r.get("metrics/mAP50(B)", 0) or 0),
                                    int(float(r["epoch"])))
            if best:
                entry["best"] = {"mAP50-95": round(best[0], 4),
                                 "mAP50": round(best[1], 4),
                                 "epoch": best[2]}
        rows.append(entry)
    print(json.dumps(rows, indent=1))


def valbest(root: Path, imgsz: int, batch: int) -> None:
    """Standalone val of each run's best.ckpt — ONE protocol for the final
    table (the in-training curves differ in EMA state and val cadence)."""
    from yolo_sod_tpu import YOLO

    table = {}
    for key in RUNS:
        ck = root / "runs" / key / "weights" / "best.ckpt"
        if not ck.exists():
            table[key] = None
            continue
        m = YOLO(str(ck))
        metrics = m.val(data=str(root / "data.yaml"), imgsz=imgsz,
                        batch=batch, conf=0.001, iou=0.7, plots=False)
        table[key] = {k: round(float(v), 4)
                      for k, v in metrics.results_dict.items()}
    (root / "valbest.json").write_text(json.dumps(table, indent=1))
    print("VALBEST " + json.dumps(table))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["gen", "train", "report", "valbest"])
    p.add_argument("--root", type=Path, default=DEFAULT_ROOT)
    p.add_argument("--model", choices=list(RUNS), default="yolov12n")
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n-train", type=int, default=320)
    p.add_argument("--n-val", type=int, default=96)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--close-p2-until", type=int, default=20)
    p.add_argument("--staged-lr", choices=["literal", "effective"],
                   default="effective")
    p.add_argument("--lr0", type=float, default=None,
                   help="override the staged run's base lr (A/B: 0.01 is "
                        "val-unstable for the 13.5M flagship on 20-step "
                        "epochs, 0.001 crawls; see PERF.md round-5)")
    p.add_argument("--patience", type=int, default=None)
    p.add_argument("--optimizer", default=None,
                   help="staged-leg optimizer (default: auto rule unless "
                        "--lr0 forces SGD)")
    args = p.parse_args()
    if args.cmd == "gen":
        make_sod_dataset(args.root, args.n_train, args.n_val)
    elif args.cmd == "train":
        train_one(args.model, args.root, args.imgsz, args.epochs, args.batch,
                  resume=args.resume, close_p2_until=args.close_p2_until,
                  staged_lr=args.staged_lr, lr0=args.lr0,
                  patience=args.patience, optimizer=args.optimizer)
    elif args.cmd == "valbest":
        valbest(args.root, args.imgsz, args.batch)
    else:
        report(args.root)


if __name__ == "__main__":
    main()
