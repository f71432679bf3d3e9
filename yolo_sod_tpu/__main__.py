"""`python -m yolo_sod_tpu <task> <mode> key=value ...` — CLI entry."""

from yolo_sod_tpu.cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
