"""Solutions: thin applications over predict+track.

TPU-native analog of the reference solutions/ package (14 modules, ~2k LoC;
solutions/__init__.py:1-31). Implemented: BaseSolution plumbing,
ObjectCounter (line/region counting), Heatmap (accumulated presence), and
SpeedEstimator (px->real-world speed from track displacement) — the three
most used; the rest are straightforward specializations of the same pattern.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional

import numpy as np

from yolo_sod_tpu.utils import LOGGER


class BaseSolution:
    """Shared plumbing: hold a YOLO model, track frames, expose results."""

    def __init__(self, model="yolov12-sod-fusion-v5-simple.yaml", classes=None,
                 conf: float = 0.25, verbose: bool = False, **kwargs):
        from yolo_sod_tpu import YOLO

        self.model = model if hasattr(model, "track") else YOLO(model)
        self.classes = classes
        self.conf = conf
        self.verbose = verbose
        self.track_history: dict[int, list] = defaultdict(list)

    def extract_tracks(self, im0):
        """Run track() on one frame; returns (boxes_xyxy, cls, track_ids)."""
        results = self.model.track(im0, persist=True, conf=self.conf,
                                   classes=self.classes, verbose=False)
        boxes = results[0].boxes
        ids = boxes.id
        if ids is None:
            return boxes.xyxy, boxes.cls, np.array([])
        return boxes.xyxy, boxes.cls, ids

    def store_track(self, track_id: int, center):
        h = self.track_history[int(track_id)]
        h.append(tuple(center))
        if len(h) > 30:
            h.pop(0)


class ObjectCounter(BaseSolution):
    """Count objects crossing a line or inside a region
    (reference solutions/object_counter.py)."""

    def __init__(self, region=None, **kwargs):
        super().__init__(**kwargs)
        # region: 2 points = counting line, >=3 points = polygon region
        self.region = [tuple(p) for p in (region or [(0, 200), (640, 200)])]
        self.in_count = 0
        self.out_count = 0
        self.counted_ids: set[int] = set()
        self.classwise: dict = defaultdict(lambda: {"IN": 0, "OUT": 0})

    def _side(self, p):
        """Signed side of the counting line for point p."""
        (x1, y1), (x2, y2) = self.region[0], self.region[1]
        return np.sign((x2 - x1) * (p[1] - y1) - (y2 - y1) * (p[0] - x1))

    def _in_polygon(self, p):
        import cv2

        return cv2.pointPolygonTest(np.array(self.region, np.float32), p, False) >= 0

    def count(self, im0):
        boxes, cls, ids = self.extract_tracks(im0)
        for box, c, tid in zip(boxes, cls, ids):
            tid = int(tid)
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            prev = self.track_history[tid][-1] if self.track_history[tid] else None
            self.store_track(tid, center)
            if tid in self.counted_ids or prev is None:
                continue
            if len(self.region) == 2:
                if self._side(prev) != self._side(center):
                    direction = "IN" if self._side(center) > 0 else "OUT"
                    self._record(tid, c, direction)
            else:
                if self._in_polygon(center) and not self._in_polygon(prev):
                    self._record(tid, c, "IN")
                elif not self._in_polygon(center) and self._in_polygon(prev):
                    self._record(tid, c, "OUT")
        return im0

    __call__ = count

    def _record(self, tid, c, direction):
        self.counted_ids.add(tid)
        if direction == "IN":
            self.in_count += 1
        else:
            self.out_count += 1
        self.classwise[int(c)][direction] += 1
        if self.verbose:
            LOGGER.info(f"count: id {tid} {direction} (in={self.in_count}, "
                        f"out={self.out_count})")


class Heatmap(BaseSolution):
    """Accumulate object presence into a heatmap overlay
    (reference solutions/heatmap.py)."""

    def __init__(self, colormap: int = 2, **kwargs):  # cv2.COLORMAP_JET == 2
        super().__init__(**kwargs)
        self.colormap = colormap
        self.heatmap: Optional[np.ndarray] = None

    def generate_heatmap(self, im0):
        import cv2

        if self.heatmap is None:
            self.heatmap = np.zeros(im0.shape[:2], np.float32)
        boxes, cls, ids = self.extract_tracks(im0)
        for box in boxes:
            x1, y1, x2, y2 = map(int, box)
            self.heatmap[max(y1, 0):y2, max(x1, 0):x2] += 1.0
        norm = cv2.normalize(self.heatmap, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        colored = cv2.applyColorMap(norm, self.colormap)
        return cv2.addWeighted(im0, 0.5, colored, 0.5, 0)

    __call__ = generate_heatmap


class SpeedEstimator(BaseSolution):
    """Track-displacement speed estimate (reference solutions/speed_estimation.py)."""

    def __init__(self, meters_per_pixel: float = 0.05, fps: float = 30.0, **kwargs):
        super().__init__(**kwargs)
        self.mpp = meters_per_pixel
        self.fps = fps
        self.speeds: dict[int, float] = {}

    def estimate_speed(self, im0):
        boxes, cls, ids = self.extract_tracks(im0)
        for box, tid in zip(boxes, ids):
            tid = int(tid)
            center = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
            h = self.track_history[tid]
            if h:
                dx = center[0] - h[-1][0]
                dy = center[1] - h[-1][1]
                dist_m = float(np.hypot(dx, dy)) * self.mpp
                self.speeds[tid] = dist_m * self.fps * 3.6   # km/h
            self.store_track(tid, center)
        return im0

    __call__ = estimate_speed


class RegionCounter(BaseSolution):
    """Live per-region object counts (reference solutions/region_counter.py)."""

    def __init__(self, regions=None, **kwargs):
        super().__init__(**kwargs)
        # {"name": [(x, y), ...] polygon}
        self.regions = regions or {"region-01": [(0, 0), (320, 0), (320, 320), (0, 320)]}
        self.counts = {k: 0 for k in self.regions}

    def count(self, im0):
        import cv2

        boxes, cls, ids = self.extract_tracks(im0)
        self.counts = {k: 0 for k in self.regions}
        for box in boxes:
            c = (float(box[0] + box[2]) / 2, float(box[1] + box[3]) / 2)
            for name, poly in self.regions.items():
                if cv2.pointPolygonTest(np.array(poly, np.float32), c, False) >= 0:
                    self.counts[name] += 1
        return im0

    __call__ = count


class QueueManager(BaseSolution):
    """Queue-length monitoring inside a region (reference solutions/queue_management.py)."""

    def __init__(self, region=None, **kwargs):
        super().__init__(**kwargs)
        self.region = region or [(0, 0), (640, 0), (640, 480), (0, 480)]
        self.queue_count = 0

    def process_queue(self, im0):
        import cv2

        boxes, cls, ids = self.extract_tracks(im0)
        self.queue_count = 0
        for box, tid in zip(boxes, ids):
            c = (float(box[0] + box[2]) / 2, float(box[1] + box[3]) / 2)
            if cv2.pointPolygonTest(np.array(self.region, np.float32), c, False) >= 0:
                self.queue_count += 1
            self.store_track(int(tid), c)
        return im0

    __call__ = process_queue


class DistanceCalculation(BaseSolution):
    """Pixel->metric distance between two selected track ids
    (reference solutions/distance_calculation.py)."""

    def __init__(self, meters_per_pixel: float = 0.05, **kwargs):
        super().__init__(**kwargs)
        self.mpp = meters_per_pixel
        self.selected: list[int] = []
        self.distance_m = None

    def select(self, track_id: int):
        if track_id in self.selected:
            self.selected.remove(track_id)
        elif len(self.selected) < 2:
            self.selected.append(track_id)

    def calculate(self, im0):
        boxes, cls, ids = self.extract_tracks(im0)
        centers = {}
        for box, tid in zip(boxes, ids):
            centers[int(tid)] = ((box[0] + box[2]) / 2, (box[1] + box[3]) / 2)
        if len(self.selected) == 2 and all(t in centers for t in self.selected):
            (x1, y1), (x2, y2) = (centers[t] for t in self.selected)
            self.distance_m = float(np.hypot(x2 - x1, y2 - y1)) * self.mpp
        return im0

    __call__ = calculate


class AIGym(BaseSolution):
    """Workout rep counting from pose keypoints (reference solutions/ai_gym.py).

    Consumes (K, 3) keypoints per person (a Pose-head model output); counts a
    rep each time the tracked joint angle crosses down past `down_angle` and
    back up past `up_angle`."""

    def __init__(self, kpts=(6, 8, 10), up_angle: float = 145.0,
                 down_angle: float = 90.0, **kwargs):
        super().__init__(**kwargs)
        self.kpt_ids = kpts
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: dict[int, int] = defaultdict(int)
        self.stage: dict[int, str] = defaultdict(lambda: "up")

    @staticmethod
    def joint_angle(a, b, c) -> float:
        """Angle ABC in degrees from three (x, y) points."""
        a, b, c = (np.asarray(p, np.float32) for p in (a, b, c))
        v1, v2 = a - b, c - b
        cos = (v1 @ v2) / (np.linalg.norm(v1) * np.linalg.norm(v2) + 1e-9)
        return float(np.degrees(np.arccos(np.clip(cos, -1, 1))))

    def monitor(self, keypoints_per_person: dict):
        """keypoints_per_person: {track_id: (K, >=2) array}."""
        i, j, k = self.kpt_ids
        for tid, kp in keypoints_per_person.items():
            ang = self.joint_angle(kp[i][:2], kp[j][:2], kp[k][:2])
            if ang < self.down_angle and self.stage[tid] == "up":
                self.stage[tid] = "down"
            elif ang > self.up_angle and self.stage[tid] == "down":
                self.stage[tid] = "up"
                self.count[tid] += 1
        return self.count


class Analytics(BaseSolution):
    """Live class-count analytics charts (reference solutions/analytics.py):
    per-frame detection counts rendered as a line/bar/pie/area chart image.
    Chart rendering needs matplotlib (import-guarded); the count history is
    always maintained so headless pipelines can consume `self.history`."""

    def __init__(self, analytics_type: str = "line", max_points: int = 45,
                 **kwargs):
        super().__init__(**kwargs)
        if analytics_type not in ("line", "bar", "pie", "area"):
            raise ValueError(f"unknown analytics_type '{analytics_type}'")
        self.analytics_type = analytics_type
        self.max_points = max_points
        self.history: list[dict[int, int]] = []   # per-frame {cls: count}

    def process_data(self, im0, frame_number: int | None = None):
        boxes, cls, ids = self.extract_tracks(im0)
        counts: dict[int, int] = defaultdict(int)
        for c in np.asarray(cls).astype(int):
            counts[int(c)] += 1
        self.history.append(dict(counts))
        if len(self.history) > self.max_points:
            self.history.pop(0)
        return self._render(im0.shape[1], im0.shape[0])

    __call__ = process_data

    def _render(self, w: int, h: int):
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            LOGGER.warning("Analytics: matplotlib unavailable, returning None chart")
            return None
        classes = sorted({c for f in self.history for c in f})
        fig, ax = plt.subplots(figsize=(w / 100, h / 100), dpi=100)
        xs = range(len(self.history))
        if self.analytics_type == "pie" and self.history:
            totals = [sum(f.get(c, 0) for f in self.history) for c in classes]
            if sum(totals):
                ax.pie(totals, labels=[str(c) for c in classes])
        else:
            for c in classes:
                ys = [f.get(c, 0) for f in self.history]
                if self.analytics_type == "bar":
                    ax.bar(xs, ys, label=str(c), alpha=0.6)
                elif self.analytics_type == "area":
                    ax.fill_between(xs, ys, label=str(c), alpha=0.5)
                else:
                    ax.plot(xs, ys, label=str(c), marker="o")
            if classes:
                ax.legend()
        fig.canvas.draw()
        img = np.asarray(fig.canvas.buffer_rgba())[..., :3][..., ::-1].copy()
        plt.close(fig)
        return img


class ParkingManagement(BaseSolution):
    """Parking-slot occupancy (reference solutions/parking_management.py):
    polygon slots (from a JSON file or a list) marked occupied when a
    detection center lies inside. `pr_info` carries the live counts."""

    def __init__(self, json_file: str | None = None, slots=None, **kwargs):
        super().__init__(**kwargs)
        if json_file is not None:
            import json

            with open(json_file) as f:
                slots = [s["points"] for s in json.load(f)]
        self.slots = [np.array(s, np.float32) for s in (slots or [])]
        self.pr_info = {"Occupancy": 0, "Available": len(self.slots)}

    def process_data(self, im0):
        import cv2

        boxes, cls, ids = self.extract_tracks(im0)
        centers = [((float(b[0]) + float(b[2])) / 2,
                    (float(b[1]) + float(b[3])) / 2) for b in boxes]
        occupied = 0
        for poly in self.slots:
            if any(cv2.pointPolygonTest(poly, c, False) >= 0 for c in centers):
                occupied += 1
                cv2.polylines(im0, [poly.astype(np.int32)], True, (0, 0, 255), 2)
            else:
                cv2.polylines(im0, [poly.astype(np.int32)], True, (0, 255, 0), 2)
        self.pr_info = {"Occupancy": occupied,
                        "Available": len(self.slots) - occupied}
        return im0

    __call__ = process_data


class ParkingZoneEditor:
    """Headless core of the parking-zone annotator (reference
    solutions/parking_management.py:14 ParkingPtsSelection, re-structured):
    all geometry/state logic — display scaling, click accumulation into
    4-point zones, undo, canvas→image rescale, JSON round-trip — lives here
    and is unit-testable without a display; ParkingPtsSelection is a thin
    Tkinter binding over it."""

    def __init__(self, max_display=(1280, 720)):
        self.max_w, self.max_h = max_display
        self.zones: list[list[tuple[int, int]]] = []
        self.pending: list[tuple[int, int]] = []
        self.imgw = self.imgh = 0
        self.disp_w = self.disp_h = 0

    def set_image_size(self, w: int, h: int) -> tuple[int, int]:
        """Record the source size; return the fitted display size."""
        self.imgw, self.imgh = w, h
        scale = min(self.max_w / w, self.max_h / h, 1.0)
        self.disp_w, self.disp_h = max(1, round(w * scale)), max(1, round(h * scale))
        self.zones.clear()
        self.pending.clear()
        return self.disp_w, self.disp_h

    def click(self, x: int, y: int) -> list[tuple[int, int]] | None:
        """Add one display-space point; returns the zone when it closes."""
        self.pending.append((x, y))
        if len(self.pending) < 4:
            return None
        zone, self.pending = self.pending, []
        self.zones.append(zone)
        return zone

    def undo(self) -> bool:
        if self.pending:
            self.pending.clear()
            return True
        if self.zones:
            self.zones.pop()
            return True
        return False

    def to_json(self) -> list[dict]:
        """Zones rescaled from display to image coordinates, in the JSON
        shape ParkingManagement consumes ([{"points": [[x, y] x4]}, ...])."""
        sx = self.imgw / max(self.disp_w, 1)
        sy = self.imgh / max(self.disp_h, 1)
        return [{"points": [[round(x * sx), round(y * sy)] for x, y in z]}
                for z in self.zones]

    def save(self, path="bounding_boxes.json") -> str:
        import json

        with open(path, "w") as f:
            json.dump(self.to_json(), f, indent=4)
        return path


class ParkingPtsSelection:
    """Tkinter UI over ParkingZoneEditor: upload an image, click 4-point
    parking zones, undo, save JSON for ParkingManagement. Requires a
    display + tkinter; everything testable lives in ParkingZoneEditor."""

    def __init__(self):
        try:
            import tkinter as tk
            from tkinter import filedialog, messagebox
        except ImportError as e:  # pragma: no cover - headless images
            raise ImportError(
                "ParkingPtsSelection needs tkinter; use ParkingZoneEditor "
                "programmatically on headless machines") from e
        self.tk, self.filedialog, self.messagebox = tk, filedialog, messagebox
        self.editor = ParkingZoneEditor()
        self.master = tk.Tk()
        self.master.title("yolo-sod-tpu parking zone selector")
        self.canvas = tk.Canvas(self.master, bg="white")
        self.canvas.pack(side=tk.BOTTOM)
        bar = tk.Frame(self.master)
        bar.pack(side=tk.TOP)
        for text, cmd in (("Upload Image", self.upload_image),
                          ("Remove Last BBox", self.remove_last),
                          ("Save", self.save)):
            tk.Button(bar, text=text, command=cmd).pack(side=tk.LEFT)
        self.image = self.photo = None
        self.master.mainloop()

    def upload_image(self):
        from PIL import Image, ImageTk

        path = self.filedialog.askopenfilename(
            filetypes=[("Image Files", "*.png *.jpg *.jpeg")])
        if not path:
            return
        self.image = Image.open(path)
        w, h = self.editor.set_image_size(*self.image.size)
        self.canvas.config(width=w, height=h)
        self.photo = ImageTk.PhotoImage(self.image.resize((w, h)))
        self._redraw()
        self.canvas.bind("<Button-1>", self._on_click)

    def _on_click(self, event):
        self.canvas.create_oval(event.x - 3, event.y - 3, event.x + 3,
                                event.y + 3, fill="red")
        zone = self.editor.click(event.x, event.y)
        if zone:
            self._draw_zone(zone)

    def _draw_zone(self, zone):
        for i in range(4):
            self.canvas.create_line(zone[i], zone[(i + 1) % 4],
                                    fill="blue", width=2)

    def _redraw(self):
        self.canvas.delete("all")
        if self.photo:
            self.canvas.create_image(0, 0, anchor=self.tk.NW, image=self.photo)
        for zone in self.editor.zones:
            self._draw_zone(zone)

    def remove_last(self):
        if not self.editor.undo():
            self.messagebox.showwarning("Warning", "No zones to remove.")
        self._redraw()

    def save(self):
        if not self.editor.imgw:
            self.messagebox.showwarning("Warning", "Upload an image first.")
            return
        self.editor.save("bounding_boxes.json")
        self.messagebox.showinfo("Success",
                                 "Zones saved to bounding_boxes.json")


class SecurityAlarm(BaseSolution):
    """Alert when the detection count crosses a threshold
    (reference solutions/security_alarm.py). Email delivery is an optional
    smtplib hook (authenticate() then records trigger send); without it the
    alarm state is still tracked for the caller."""

    def __init__(self, records: int = 5, **kwargs):
        super().__init__(**kwargs)
        self.records = records
        self.email_sent = False
        self.alerts = 0
        self._smtp = None
        self._to = None

    def authenticate(self, from_email: str, password: str, to_email: str,
                     server: str = "smtp.gmail.com", port: int = 465):
        import smtplib

        self._smtp = smtplib.SMTP_SSL(server, port)
        self._smtp.login(from_email, password)
        self._from, self._to = from_email, to_email

    def monitor(self, im0):
        boxes, cls, ids = self.extract_tracks(im0)
        n = len(boxes)
        if n >= self.records and not self.email_sent:
            self.alerts += 1
            self.email_sent = True
            if self._smtp is not None:
                from email.mime.text import MIMEText

                msg = MIMEText(f"Security alert: {n} objects detected")
                msg["Subject"] = "Security Alert"
                msg["From"], msg["To"] = self._from, self._to
                self._smtp.send_message(msg)
            if self.verbose:
                LOGGER.info(f"security alarm: {n} objects (threshold {self.records})")
        elif n < self.records:
            self.email_sent = False
        return im0

    __call__ = monitor


class TrackZone(BaseSolution):
    """Track objects only inside a zone polygon
    (reference solutions/trackzone.py): pixels outside the zone are blanked
    before inference, so detection/tracking is confined to the region."""

    def __init__(self, region=None, **kwargs):
        super().__init__(**kwargs)
        self.region = np.array(region or [(150, 150), (1130, 150),
                                          (1130, 570), (150, 570)], np.int32)
        self.n_tracked = 0

    def trackzone(self, im0):
        import cv2

        mask = np.zeros_like(im0[..., 0])
        cv2.fillPoly(mask, [self.region], 255)
        masked = cv2.bitwise_and(im0, im0, mask=mask)
        boxes, cls, ids = self.extract_tracks(masked)
        self.n_tracked = len(boxes)
        cv2.polylines(im0, [self.region], True, (255, 255, 255), 2)
        return im0

    __call__ = trackzone


def streamlit_inference(model="yolov12-sod-fusion-v5-simple.yaml"):
    """Streamlit webcam/video inference app
    (reference solutions/streamlit_inference.py). Requires streamlit, which
    is not baked into this image — import-guarded with guidance."""
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError(
            "streamlit is required for the web inference app: run "
            "`pip install streamlit` in a networked environment, or use "
            "app.py (Gradio) which ships in-image") from e

    from yolo_sod_tpu import YOLO

    st.title("yolo-sod-tpu inference")
    source = st.text_input("source", "0")
    conf = st.slider("confidence", 0.0, 1.0, 0.25)
    if st.button("Run"):
        yolo = YOLO(model)
        for r in yolo.predict(source, conf=conf, stream=True):
            st.image(r.plot(), channels="BGR")
