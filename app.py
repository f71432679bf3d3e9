#!/usr/bin/env python
"""Demo app: image/video inference with annotated output.

Capability analog of the reference's Gradio app.py; launches the Gradio UI
when gradio is installed, otherwise runs a CLI demo over a source path.

    python app.py --source path/to/imgs --model yolov12-sod-fusion-v5-simple.yaml
"""

import argparse
from pathlib import Path


def cli_demo(model_id, source, imgsz, conf, out_dir="runs/app"):
    from yolo_sod_tpu import YOLO

    model = YOLO(model_id)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for i, r in enumerate(model.predict(source, imgsz=imgsz, conf=conf, stream=True)):
        dst = out / f"{Path(str(r.path)).stem or i}_pred.jpg"
        r.save(str(dst))
        print(f"{r.path}: {r.verbose()} -> {dst}")


def gradio_app(model_id, imgsz, conf):
    import gradio as gr

    from yolo_sod_tpu import YOLO

    model = YOLO(model_id)

    def infer(image, image_size, conf_threshold):
        results = model.predict(image[..., ::-1], imgsz=int(image_size),
                                conf=float(conf_threshold))
        return results[0].plot()[..., ::-1]

    demo = gr.Interface(
        fn=infer,
        inputs=[gr.Image(), gr.Slider(320, 1280, value=imgsz, step=32),
                gr.Slider(0.0, 1.0, value=conf)],
        outputs=gr.Image(),
        title="yolo-sod-tpu")
    demo.launch()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov12-sod-fusion-v5-simple.yaml")
    p.add_argument("--source", default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.25)
    args = p.parse_args()
    try:
        import gradio  # noqa: F401

        if args.source is None:
            gradio_app(args.model, args.imgsz, args.conf)
        else:
            cli_demo(args.model, args.source, args.imgsz, args.conf)
    except ImportError:
        if args.source is None:
            raise SystemExit("gradio not installed; pass --source for the CLI demo")
        cli_demo(args.model, args.source, args.imgsz, args.conf)
