"""Array-first BYTE tracking.

Behavioral contract: the two-stage high/low-confidence association of
ByteTrack as shipped by the reference (trackers/byte_tracker.py — STrack :12,
BYTETracker.update :263-476): stage-1 Hungarian over fused IoU·score costs,
stage-2 low-confidence rescue for still-tracked rows, an unconfirmed-track
gate, per-frame Kalman prediction, lost-track expiry, and IoU duplicate
pruning between the tracked and lost sets.

Structural re-design: the reference mutates one Python object per tracklet
and shuffles them between lists (`STrack.update/re_activate/activate`,
`joint_stracks`/`sub_stracks`). Here NO per-track objects exist at all —
every tracklet attribute is a column in a numpy struct-of-arrays
(`TrackStore`), the tracked/lost/removed sets are row-index lists, and each
pipeline stage is one vectorized operation over an index set: a single
batched Kalman predict/update (`KalmanFilterXYAH.multi_update`) covers all
matched rows of a stage regardless of whether they are continuations or
re-activations; the continuation/re-activation distinction reduces to a
boolean mask applied to the `length`/ordering columns afterwards.
Equivalence to the reference is pinned frame-by-frame by
tests/test_tracker_equivalence.py (recorded synthetic sequences through both
implementations).
"""

from __future__ import annotations

import enum

import numpy as np

from yolo_sod_tpu.trackers.utils import matching
from yolo_sod_tpu.trackers.utils.kalman_filter import KalmanFilterXYAH


class TrackState(enum.IntEnum):
    """Lifecycle of a TrackStore row: fresh detections enter as New, promote
    to Tracked on association, demote to Lost when unmatched, and retire to
    Removed after `track_buffer` frames (or on duplicate pruning). Stored as
    the int `state` column of TrackStore."""

    New = 0
    Tracked = 1
    Lost = 2
    Removed = 3


class TrackStore:
    """Struct-of-arrays store: one row per tracklet, columns for every
    attribute. Rows are append-only; dead rows are compacted opportunistically
    (`compact`), remapping the caller's index lists."""

    _CAP0 = 64

    def __init__(self, aspect_state: bool = True):
        self.aspect_state = aspect_state   # True: (x, y, a, h) means; False: (x, y, w, h)
        self.n = 0
        cap = self._CAP0
        self.mean = np.zeros((cap, 8))
        self.cov = np.zeros((cap, 8, 8))
        self.score = np.zeros(cap)
        self.cls = np.zeros(cap)
        self.det_idx = np.full(cap, -1.0)
        self.tid = np.zeros(cap, np.int64)
        self.state = np.full(cap, TrackState.New, np.int64)
        self.active = np.zeros(cap, bool)
        self.length = np.zeros(cap, np.int64)
        self.t_start = np.zeros(cap, np.int64)
        self.t_end = np.zeros(cap, np.int64)
        self.feat = None        # lazily (N, D) smoothed appearance embeddings

    # -- storage ------------------------------------------------------------

    def _grow(self, need: int):
        cap = len(self.score)
        if self.n + need <= cap:
            return
        new_cap = max(cap * 2, self.n + need)
        for name in ("mean", "cov", "score", "cls", "det_idx", "tid", "state",
                     "active", "length", "t_start", "t_end", "feat"):
            col = getattr(self, name)
            if col is None:
                continue
            grown = np.zeros((new_cap,) + col.shape[1:], col.dtype)
            grown[: self.n] = col[: self.n]
            setattr(self, name, grown)

    def append(self, k: int) -> np.ndarray:
        """Reserve k fresh rows; returns their indices."""
        self._grow(k)
        idx = np.arange(self.n, self.n + k)
        self.n += k
        return idx

    def compact(self, keep_lists: list[list[int]]) -> None:
        """Drop rows not referenced by any index list; remap lists in place."""
        live = sorted({i for lst in keep_lists for i in lst})
        remap = {old: new for new, old in enumerate(live)}
        sel = np.asarray(live, int)
        for name in ("mean", "cov", "score", "cls", "det_idx", "tid", "state",
                     "active", "length", "t_start", "t_end", "feat"):
            col = getattr(self, name)
            if col is None:
                continue
            col[: len(sel)] = col[sel]
            setattr(self, name, col)
        self.n = len(sel)
        for lst in keep_lists:
            lst[:] = [remap[i] for i in lst]

    # -- vectorized tracklet ops --------------------------------------------

    def xyxy(self, idx) -> np.ndarray:
        """(k, 4) corner boxes from the Kalman means."""
        m = self.mean[idx]
        w = m[:, 2] * m[:, 3] if self.aspect_state else m[:, 2]
        h = m[:, 3]
        out = np.empty((len(m), 4), np.float32)
        out[:, 0] = m[:, 0] - w / 2
        out[:, 1] = m[:, 1] - h / 2
        out[:, 2] = m[:, 0] + w / 2
        out[:, 3] = m[:, 1] + h / 2
        return out

    def predict(self, idx, kf, still_dims=(7,)) -> None:
        """Batched Kalman predict; non-tracked rows freeze `still_dims`."""
        if len(idx) == 0:
            return
        idx = np.asarray(idx, int)
        mean = self.mean[idx].copy()
        frozen = self.state[idx] != TrackState.Tracked
        for d in still_dims:
            mean[frozen, d] = 0.0
        self.mean[idx], self.cov[idx] = kf.multi_predict(mean, self.cov[idx])

    def kf_update(self, idx, measurements, kf) -> None:
        if len(idx) == 0:
            return
        idx = np.asarray(idx, int)
        self.mean[idx], self.cov[idx] = kf.multi_update(
            self.mean[idx], self.cov[idx], measurements)

    def warp(self, idx, H: np.ndarray) -> None:
        """Apply a camera-motion affine to the Kalman states (multi_gmc)."""
        if len(idx) == 0:
            return
        idx = np.asarray(idx, int)
        R8 = np.kron(np.eye(4), H[:2, :2])
        self.mean[idx] = self.mean[idx] @ R8.T
        self.mean[idx, :2] += H[:2, 2]
        self.cov[idx] = R8 @ self.cov[idx] @ R8.T

    def mark_matched(self, idx, frame: int, scores, clss, det_ids,
                     continuation) -> None:
        """Column updates shared by continuation and re-activation rows:
        length += 1 for continuations, reset to 0 for re-activations."""
        idx = np.asarray(idx, int)
        self.length[idx] = np.where(continuation, self.length[idx] + 1, 0)
        self.state[idx] = TrackState.Tracked
        self.active[idx] = True
        self.t_end[idx] = frame
        self.score[idx] = scores
        self.cls[idx] = clss
        self.det_idx[idx] = det_ids

    def results(self, idx) -> np.ndarray:
        """(k, 8) rows [x1, y1, x2, y2, tid, score, cls, det_idx]."""
        idx = np.asarray(idx, int)
        if len(idx) == 0:
            return np.zeros((0, 8), np.float32)
        return np.concatenate(
            [self.xyxy(idx),
             self.tid[idx, None].astype(np.float32),
             self.score[idx, None].astype(np.float32),
             self.cls[idx, None].astype(np.float32),
             self.det_idx[idx, None].astype(np.float32)], axis=1)


def _merge(a: list[int], b: list[int]) -> list[int]:
    """Order-preserving union of row-index lists (a then unseen of b)."""
    seen = set(a)
    return a + [i for i in b if i not in seen and not seen.add(i)]


def _without(a: list[int], b: list[int]) -> list[int]:
    drop = set(b)
    return [i for i in a if i not in drop]


class BYTETracker:
    """Two-stage detection-to-track association over a TrackStore."""

    def __init__(self, args, frame_rate: int = 30):
        self.args = args
        self._frame_rate = frame_rate
        self.store = TrackStore(aspect_state=self.aspect_state)
        self.tracked: list[int] = []
        self.lost: list[int] = []
        self.removed: list[int] = []
        self.frame_id = 0
        self._next_id = 0
        self.max_time_lost = int(frame_rate / 30.0 * args.track_buffer)
        self.kf = self.get_kalmanfilter()

    # hooks specialized by BOTSORT -------------------------------------------
    still_dims = (7,)                     # xyah: freeze vh when not tracked
    aspect_state = True                   # Kalman mean is (x, y, a, h)

    def get_kalmanfilter(self):
        return KalmanFilterXYAH()

    def measurement(self, tlwh: np.ndarray) -> np.ndarray:
        """(k, 4) tlwh -> Kalman measurement space (xyah here)."""
        m = tlwh.copy()
        m[:, :2] += m[:, 2:] / 2
        m[:, 2] /= m[:, 3]
        return m

    def det_features(self, det, img):
        return None                       # ReID hook (BOTSORT w/ encoder)

    def fused_dists(self, idx, det) -> np.ndarray:
        """Stage-1/3 association costs: IoU (+ optional score fusion)."""
        dists = matching.iou_distance(self.store.xyxy(idx), det["xyxy"])
        if self.args.fuse_score and dists.size:
            dists = 1 - (1 - dists) * det["score"][None, :]
        return dists

    # ------------------------------------------------------------------------

    def _split(self, results) -> tuple[dict, dict]:
        """Partition raw detections into high / low confidence banks."""
        score = np.asarray(results.conf, np.float64)
        xywh = np.asarray(results.xywh, np.float64).reshape(len(score), -1)[:, :4] \
            if len(score) else np.zeros((0, 4))
        cls = np.asarray(results.cls, np.float64)
        tlwh = xywh.copy()
        tlwh[:, :2] -= tlwh[:, 2:] / 2
        xyxy = np.concatenate([tlwh[:, :2], tlwh[:, :2] + tlwh[:, 2:]], 1)
        det_idx = np.arange(len(score), dtype=np.float64)

        def bank(m):
            return {"tlwh": tlwh[m], "xyxy": xyxy[m], "score": score[m],
                    "cls": cls[m], "idx": det_idx[m]}

        hi = score >= self.args.track_high_thresh
        lo = (score > self.args.track_low_thresh) & ~hi & \
            (score < self.args.track_high_thresh)
        return bank(hi), bank(lo)

    def _associate(self, idx: list[int], det: dict, sel: np.ndarray,
                   dists: np.ndarray, thresh: float):
        """Hungarian-match store rows against a detection bank subset.

        Returns (matched_rows, det_positions, unmatched_row_positions,
        unmatched_det_positions)."""
        matches, u_rows, u_dets = matching.linear_assignment(dists, thresh)
        rows = np.asarray([idx[int(r)] for r, _ in matches], int)
        dpos = np.asarray([sel[int(c)] for _, c in matches], int)
        return rows, dpos, list(u_rows), list(u_dets)

    def _apply_matches(self, rows, dpos, det, frame: int):
        """One batched KF update for all matched rows; split into
        continuations (were Tracked) and re-activations (were Lost)."""
        if len(rows) == 0:
            return [], []
        cont = self.store.state[rows] == TrackState.Tracked
        self.store.kf_update(rows, self.measurement(det["tlwh"][dpos]), self.kf)
        self.store.mark_matched(rows, frame, det["score"][dpos],
                                det["cls"][dpos], det["idx"][dpos], cont)
        return [int(r) for r, c in zip(rows, cont) if c], \
               [int(r) for r, c in zip(rows, cont) if not c]

    def update(self, results, img=None) -> np.ndarray:
        """Advance one frame. `results` carries .conf/.xywh/.cls arrays.

        Returns (n, 8) float32 [x1, y1, x2, y2, id, conf, cls, det_idx] for
        the activated tracks."""
        self.frame_id += 1
        st = self.store
        hi, lo = self._split(results)

        confirmed = [i for i in self.tracked if st.active[i]]
        unconfirmed = [i for i in self.tracked if not st.active[i]]
        pool = _merge(confirmed, self.lost)

        # Motion: batched KF predict over the pool (+ optional GMC warp).
        st.predict(pool, self.kf, self.still_dims)
        if getattr(self, "gmc", None) is not None and img is not None:
            H = self.gmc.apply(img, np.concatenate(
                [hi["xyxy"], hi["score"][:, None], hi["cls"][:, None]], 1)
                if len(hi["score"]) else np.zeros((0, 6)))
            st.warp(pool, H)
            st.warp(unconfirmed, H)

        # Stage 1: high-confidence detections vs tracked+lost pool.
        feats = self.det_features(hi, img)
        if feats is not None:
            hi["feat"] = feats
        sel_hi = np.arange(len(hi["score"]))
        rows, dpos, u_pool, u_hi = self._associate(
            pool, hi, sel_hi, self.fused_dists(pool, hi),
            self.args.match_thresh)
        act1, refound1 = self._apply_matches(rows, dpos, hi, self.frame_id)

        # Stage 2: low-confidence rescue for rows still in Tracked state.
        rescue = [pool[i] for i in u_pool
                  if st.state[pool[i]] == TrackState.Tracked]
        sub_lo = {k: v for k, v in lo.items()}
        d2 = matching.iou_distance(st.xyxy(rescue), lo["xyxy"])
        rows, dpos, u_rescue, _ = self._associate(
            rescue, sub_lo, np.arange(len(lo["score"])), d2, 0.5)
        act2, refound2 = self._apply_matches(rows, dpos, lo, self.frame_id)

        newly_lost = []
        for p in u_rescue:
            r = rescue[int(p)]
            if st.state[r] != TrackState.Lost:
                st.state[r] = TrackState.Lost
                newly_lost.append(r)

        # Stage 3: unconfirmed tracks vs detections left over from stage 1.
        sel_rem = np.asarray([int(i) for i in u_hi], int)
        rem = {k: v[sel_rem] for k, v in hi.items()}
        rows, dpos, u_unc, u_rem = self._associate(
            unconfirmed, rem, sel_rem, self.fused_dists(unconfirmed, rem),
            0.7)
        act3, _ = self._apply_matches(rows, dpos, hi, self.frame_id)
        newly_removed = []
        for p in u_unc:
            r = unconfirmed[int(p)]
            st.state[r] = TrackState.Removed
            newly_removed.append(r)

        # Births: remaining high-confidence detections above the birth bar.
        born = []
        birth_pos = np.asarray([int(sel_rem[int(p)]) for p in u_rem], int)
        birth_pos = birth_pos[hi["score"][birth_pos] >= self.args.new_track_thresh] \
            if len(birth_pos) else birth_pos
        if len(birth_pos):
            born = self._spawn(hi, birth_pos)

        # Expiry: lost rows beyond the time budget.
        for r in self.lost:
            if self.frame_id - st.t_end[r] > self.max_time_lost:
                st.state[r] = TrackState.Removed
                newly_removed.append(r)

        # Set algebra over index lists (same merge semantics as the
        # reference's joint/sub/duplicate pruning, on rows instead of objects).
        activated = act1 + act2 + act3 + born
        refound = refound1 + refound2
        tracked = [i for i in self.tracked if st.state[i] == TrackState.Tracked]
        tracked = _merge(_merge(tracked, activated), refound)
        lost = _without(self.lost, tracked) + newly_lost
        lost = _without(lost, self.removed)
        tracked, lost = self._prune_duplicates(tracked, lost)
        self.tracked, self.lost = tracked, lost
        self.removed.extend(newly_removed)
        if len(self.removed) > 1000:
            self.removed = self.removed[-999:]
        if st.n > 4096 and st.n > 4 * (len(self.tracked) + len(self.lost)):
            st.compact([self.tracked, self.lost, self.removed])

        out = [i for i in self.tracked if st.active[i]]
        return st.results(out)

    def _spawn(self, det: dict, pos: np.ndarray) -> list[int]:
        """Vectorized track births from a detection bank subset."""
        st = self.store
        k = len(pos)
        rows = st.append(k)
        st.mean[rows], st.cov[rows] = self.kf.multi_initiate(
            self.measurement(det["tlwh"][pos]))
        st.tid[rows] = np.arange(self._next_id + 1, self._next_id + k + 1)
        self._next_id += k
        st.state[rows] = TrackState.Tracked
        st.active[rows] = self.frame_id == 1
        st.score[rows] = det["score"][pos]
        st.cls[rows] = det["cls"][pos]
        st.det_idx[rows] = det["idx"][pos]
        st.length[rows] = 0
        st.t_start[rows] = st.t_end[rows] = self.frame_id
        if det.get("feat") is not None and st.feat is not None:
            st.feat[rows] = det["feat"][pos]
        return [int(r) for r in rows]

    def _prune_duplicates(self, tracked: list[int], lost: list[int]):
        """Drop whichever of an IoU>0.85 tracked/lost pair is younger."""
        st = self.store
        d = matching.iou_distance(st.xyxy(np.asarray(tracked, int)),
                                  st.xyxy(np.asarray(lost, int)))
        pairs = np.where(d < 0.15)
        drop_t, drop_l = set(), set()
        for p, q in zip(*pairs):
            age_t = st.t_end[tracked[p]] - st.t_start[tracked[p]]
            age_l = st.t_end[lost[q]] - st.t_start[lost[q]]
            if age_t > age_l:
                drop_l.add(int(q))
            else:
                drop_t.add(int(p))
        return ([t for i, t in enumerate(tracked) if i not in drop_t],
                [t for i, t in enumerate(lost) if i not in drop_l])

    def reset(self):
        BYTETracker.__init__(self, self.args, frame_rate=self._frame_rate)
