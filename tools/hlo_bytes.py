"""Static HBM-traffic breakdown of a compiled XLA module.

Parses the optimized HLO text of the jitted flagship forward and attributes
bytes (operand reads + result writes at fusion boundaries) to op categories:
convolution, fusion (elementwise epilogues), copy/transpose/reshape,
reduce, dot, all-else. Fusion-internal ops are free (VMEM); only tensors
crossing fusion boundaries cost HBM, which is exactly what the optimized
module's top-level instruction list shows.

This is how we decide what to attack: if copies/transposes carry real
bytes, there is layout fat to cut; if it is all convolution+fusion, the
forward is at its bandwidth floor (PERF.md).

Usage: python tools/hlo_bytes.py [imgsz] [batch]   (compiles for the
current backend — run under the TPU for the real layout decisions).
"""

from __future__ import annotations

import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of one shape literal like 'bf16[16,160,160,64]' or a
    tuple '(bf16[...], f32[...])'."""
    total = 0
    for dt, dims in SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


# `%name = SHAPE opname(operands...)` — SHAPE may be a tuple whose layout
# annotations contain parens (`T(8,128)(2,1)S(1)`), so match the op as the
# last hyphenated word right before an operands paren (ops are always
# immediately followed by `(`; nothing inside a shape literal is).
INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s([\w\-]+)\(", re.M)


def categorize(opname: str, line: str) -> str:
    if opname == "fusion":
        return "fusion(elementwise)"
    if opname in ("convolution", "custom-call") and ("conv" in line or "Conv" in line):
        return "convolution"
    if opname == "custom-call":
        return "custom-call"
    if opname in ("copy", "transpose", "reshape", "bitcast", "copy-done"):
        return "copy/layout"
    if opname in ("dynamic-update-slice", "dynamic-slice", "slice", "pad",
                  "concatenate"):
        return "slice/pad/concat"
    if opname in ("reduce", "reduce-window"):
        return "reduce"
    if opname in ("dot", "sort"):
        return opname
    if opname in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast-convert", "copy-start", "async-start",
                  "async-update", "after-all", "partition-id", "replica-id"):
        # copy-start's tuple result aliases the copy-done output — count the
        # write once, at copy-done; GTE/tuple are metadata, not traffic.
        return "(free)"
    return "other:" + opname


def entry_block(hlo_text: str) -> str:
    """Extract the ENTRY computation body — instructions inside
    %fused_computation bodies live in VMEM and must not be counted as HBM
    writes (counting them inflated e.g. silu's internal `negate` to a
    phantom 1.4 GB)."""
    m = re.search(r"^ENTRY [^{]*\{", hlo_text, re.M)
    if not m:
        return hlo_text
    depth, i = 0, m.end() - 1
    for i in range(m.end() - 1, len(hlo_text)):
        if hlo_text[i] == "{":
            depth += 1
        elif hlo_text[i] == "}":
            depth -= 1
            if depth == 0:
                break
    return hlo_text[m.start():i + 1]


def analyze(hlo_text: str, top: int = 15):
    hlo_text = entry_block(hlo_text)
    by_cat = defaultdict(int)
    rows = []
    for m in INSTR_RE.finditer(hlo_text):
        name, shape_str, op = m.group(1), m.group(2), m.group(3)
        line = hlo_text[m.start():m.start() + 400].split("\n", 1)[0]
        out_b = shape_bytes(shape_str)
        if out_b == 0:
            continue
        cat = categorize(op, line)
        if cat == "(free)":
            continue
        # Result write; operand reads are other instructions' writes and
        # would double-count, so we count each boundary tensor once (its
        # write) plus once per extra consumer — consumers are not visible
        # here, so this is a lower bound on traffic.
        by_cat[cat] += out_b
        rows.append((out_b, cat, line[:160]))
    rows.sort(reverse=True)
    total = sum(by_cat.values())
    print(f"{'category':<24}{'GB written':>12}  {'%':>6}")
    for cat, b in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<24}{b / 1e9:>12.3f}  {100 * b / max(total, 1):>5.1f}%")
    print(f"{'TOTAL (writes only)':<24}{total / 1e9:>12.3f}")
    print(f"\ntop {top} single tensors:")
    for b, cat, line in rows[:top]:
        print(f"  {b / 1e6:10.1f} MB  {cat:<22} {line}")


def main(imgsz: int = 640, batch: int = 16,
         cfg: str = "yolov12-sod-fusion-v5-simple.yaml"):
    import jax
    # Persistent compile cache: enabled library-wide under the user cache
    # dir (yolo_sod_tpu/__init__.py) — shared with bench.py.
    import yolo_sod_tpu  # noqa: F401  (cache side effect)
    import jax.numpy as jnp
    import numpy as np

    from yolo_sod_tpu.nn.tasks import DetectionModel

    model = DetectionModel(cfg)
    model.init(imgsz=imgsz)
    variables = jax.tree_util.tree_map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        model.variables)

    # variables is a jit ARGUMENT (closure constants cost a device->host
    # fetch per leaf at trace time; see bench.py).
    def fwd(v, x):
        return model.apply(v, x.astype(jnp.bfloat16), train=False)

    x = jnp.asarray(np.random.default_rng(0).random(
        (batch, imgsz, imgsz, 3), np.float32))
    compiled = jax.jit(fwd).lower(variables, x).compile()
    analyze(compiled.as_text())


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    extra = [a for a in sys.argv[3:4]]          # optional model yaml
    main(*args, *extra)
