"""NumPy oracle of the reference DeepSORT semantics for parity testing.

Independent re-statement (from the algorithm spec, float64, scipy Hungarian)
of the behavior in /root/reference/networks/deepsort: matching cascade with
cosine-gallery costs gated by Mahalanobis distance, IoU stage, track
lifecycle, gallery budget, output rule. This is the ground truth the
vectorized JAX tracker (vehicle_counting_tpu/tracking) is tested against.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg
from scipy.optimize import linear_sum_assignment

CHI2_GATE = 9.4877
INFTY = 1e5


class KF:
    def __init__(self):
        self.F = np.eye(8)
        for i in range(4):
            self.F[i, 4 + i] = 1.0
        self.H = np.eye(4, 8)
        self.swp, self.swv = 1 / 20, 1 / 160

    def initiate(self, m):
        mean = np.r_[m, np.zeros(4)]
        h = m[3]
        std = [2 * self.swp * h, 2 * self.swp * h, 1e-2, 2 * self.swp * h,
               10 * self.swv * h, 10 * self.swv * h, 1e-5, 10 * self.swv * h]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        q = np.diag(np.square([self.swp * h, self.swp * h, 1e-2, self.swp * h,
                               self.swv * h, self.swv * h, 1e-5, self.swv * h]))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov):
        h = mean[3]
        r = np.diag(np.square([self.swp * h, self.swp * h, 1e-1, self.swp * h]))
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, z):
        pm, pc = self.project(mean, cov)
        chol = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve(chol, (cov @ self.H.T).T).T
        return mean + (z - pm) @ gain.T, cov - gain @ pc @ gain.T

    def gating(self, mean, cov, zs):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = zs - pm
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return np.sum(z * z, axis=0)


def tlwh_to_xyah(t):
    return np.array([t[0] + t[2] / 2, t[1] + t[3] / 2, t[2] / max(t[3], 1e-6), t[3]])


def iou_tlwh(a, bs):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    out = []
    for b in bs:
        bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
        ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        iy = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = ix * iy
        u = a[2] * a[3] + b[2] * b[3] - inter
        out.append(inter / u if u > 0 else 0.0)
    return np.array(out)


class Track:
    TENT, CONF, DEL = 1, 2, 3

    def __init__(self, mean, cov, tid, n_init, max_age, feature, conf):
        self.mean, self.cov = mean, cov
        self.track_id = tid
        self.hits = 1
        self.age = 1
        self.tsu = 0
        self.state = Track.TENT
        self.features = [feature]
        self.n_init, self.max_age = n_init, max_age
        self.conf = conf

    def predict(self, kf):
        self.mean, self.cov = kf.predict(self.mean, self.cov)
        self.age += 1
        self.tsu += 1

    def update(self, kf, det):
        tlwh, conf, feat = det
        self.mean, self.cov = kf.update(self.mean, self.cov, tlwh_to_xyah(tlwh))
        self.features.append(feat)
        self.conf = conf
        self.hits += 1
        self.tsu = 0
        if self.state == Track.TENT and self.hits >= self.n_init:
            self.state = Track.CONF

    def mark_missed(self):
        if self.state == Track.TENT:
            self.state = Track.DEL
        elif self.tsu > self.max_age:
            self.state = Track.DEL

    def to_tlwh(self):
        m = self.mean
        w = m[2] * m[3]
        return np.array([m[0] - w / 2, m[1] - m[3] / 2, w, m[3]])


def sort_nms(tlwhs, scores, max_overlap):
    n = len(tlwhs)
    if n == 0:
        return []
    x1 = tlwhs[:, 0]
    y1 = tlwhs[:, 1]
    x2 = tlwhs[:, 2] + tlwhs[:, 0]
    y2 = tlwhs[:, 3] + tlwhs[:, 1]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = list(np.argsort(scores, kind="stable"))
    pick = []
    while idxs:
        i = idxs.pop()
        pick.append(i)
        keep = []
        for j in idxs:
            w = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
            h = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
            if (w * h) / area[j] <= max_overlap:
                keep.append(j)
        idxs = keep
    # NOTE: the reference returns picks in PROCESSING order (descending
    # score), and the detection list downstream keeps that order — it feeds
    # Hungarian column order and new-track id assignment.
    return pick


class OracleDeepSort:
    """One class instance: min-conf filter + NMS + cascade tracker."""

    def __init__(self, max_dist=0.2, min_confidence=0.25, nms_max_overlap=0.5,
                 max_iou_distance=0.6, max_age=30, n_init=3, nn_budget=60):
        self.kf = KF()
        self.tracks: list[Track] = []
        self.samples: dict[int, list] = {}
        self.next_id = 1
        self.max_dist = max_dist
        self.min_confidence = min_confidence
        self.nms_max_overlap = nms_max_overlap
        self.max_iou_distance = max_iou_distance
        self.max_age = max_age
        self.n_init = n_init
        self.nn_budget = nn_budget

    # --- costs ---------------------------------------------------------------
    def _nn_cost(self, feats, targets):
        cost = np.zeros((len(targets), len(feats)))
        f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        for i, t in enumerate(targets):
            g = np.asarray(self.samples[t])
            g = g / np.linalg.norm(g, axis=1, keepdims=True)
            cost[i] = (1.0 - g @ f.T).min(axis=0)
        return cost

    def _min_cost_matching(self, cost_fn, thr, track_idx, det_idx, dets):
        if not track_idx or not det_idx:
            return [], list(track_idx), list(det_idx)
        cost = cost_fn(track_idx, det_idx, dets)
        cost = np.where(cost > thr, thr + 1e-5, cost)
        ri, ci = linear_sum_assignment(cost)
        matches, um_t, um_d = [], [], []
        for r, t in enumerate(track_idx):
            if r not in ri:
                um_t.append(t)
        for c, d in enumerate(det_idx):
            if c not in ci:
                um_d.append(d)
        for r, c in zip(ri, ci):
            if cost[r, c] > thr:
                um_t.append(track_idx[r])
                um_d.append(det_idx[c])
            else:
                matches.append((track_idx[r], det_idx[c]))
        return matches, um_t, um_d

    def _gated_app_cost(self, track_idx, det_idx, dets):
        feats = np.array([dets[i][2] for i in det_idx])
        targets = [self.tracks[i].track_id for i in track_idx]
        cost = self._nn_cost(feats, targets)
        zs = np.array([tlwh_to_xyah(dets[i][0]) for i in det_idx])
        for r, ti in enumerate(track_idx):
            g = self.kf.gating(self.tracks[ti].mean, self.tracks[ti].cov, zs)
            cost[r, g > CHI2_GATE] = INFTY
        return cost

    def _iou_cost(self, track_idx, det_idx, dets):
        cost = np.zeros((len(track_idx), len(det_idx)))
        boxes = [dets[i][0] for i in det_idx]
        for r, ti in enumerate(track_idx):
            if self.tracks[ti].tsu > 1:
                cost[r, :] = INFTY
            else:
                cost[r] = 1.0 - iou_tlwh(self.tracks[ti].to_tlwh(), boxes)
        return cost

    # --- main ---------------------------------------------------------------
    def update(self, boxes_xyxy, confidences, feats, frame_hw):
        h, w = frame_hw
        tlwhs = boxes_xyxy.astype(np.float64).copy()
        tlwhs[:, 2] -= tlwhs[:, 0]
        tlwhs[:, 3] -= tlwhs[:, 1]
        dets = [
            (tlwhs[i], confidences[i], feats[i])
            for i in range(len(tlwhs))
            if confidences[i] > self.min_confidence
        ]
        if dets:
            keep = sort_nms(np.array([d[0] for d in dets]),
                            np.array([d[1] for d in dets]), self.nms_max_overlap)
            dets = [dets[i] for i in keep]

        for t in self.tracks:
            t.predict(self.kf)

        # --- cascade on confirmed ---
        confirmed = [i for i, t in enumerate(self.tracks) if t.state == Track.CONF]
        unconfirmed = [i for i, t in enumerate(self.tracks) if t.state != Track.CONF]
        unmatched_d = list(range(len(dets)))
        matches_a, um_t_a = [], []
        remaining = set(confirmed)
        for level in range(self.max_age):
            if not unmatched_d:
                break
            lvl = [k for k in confirmed if self.tracks[k].tsu == 1 + level]
            if not lvl:
                continue
            m, um_t, unmatched_d = self._min_cost_matching(
                self._gated_app_cost, self.max_dist, lvl, unmatched_d, dets
            )
            matches_a += m
            for k, _ in m:
                remaining.discard(k)
        um_t_a = sorted(remaining)

        iou_cands = unconfirmed + [k for k in um_t_a if self.tracks[k].tsu == 1]
        um_t_a = [k for k in um_t_a if self.tracks[k].tsu != 1]
        matches_b, um_t_b, unmatched_d = self._min_cost_matching(
            self._iou_cost, self.max_iou_distance, iou_cands, unmatched_d, dets
        )
        matches = matches_a + matches_b
        unmatched_t = list(set(um_t_a + um_t_b))

        for ti, di in matches:
            self.tracks[ti].update(self.kf, dets[di])
        for ti in unmatched_t:
            self.tracks[ti].mark_missed()
        for di in unmatched_d:
            mean, cov = self.kf.initiate(tlwh_to_xyah(dets[di][0]))
            self.tracks.append(
                Track(mean, cov, self.next_id, self.n_init, self.max_age,
                      dets[di][2], dets[di][1])
            )
            self.next_id += 1
        self.tracks = [t for t in self.tracks if t.state != Track.DEL]

        active = {t.track_id for t in self.tracks if t.state == Track.CONF}
        for t in self.tracks:
            if t.state != Track.CONF:
                continue
            for f in t.features:
                self.samples.setdefault(t.track_id, []).append(f)
                self.samples[t.track_id] = self.samples[t.track_id][-self.nn_budget:]
            t.features = []
        self.samples = {k: v for k, v in self.samples.items() if k in active}

        outputs = []
        for t in self.tracks:
            if t.state != Track.CONF or t.tsu > 1:
                continue
            b = t.to_tlwh()
            x1 = max(int(b[0]), 0)
            x2 = min(int(b[0] + b[2]), w - 1)
            y1 = max(int(b[1]), 0)
            y2 = min(int(b[1] + b[3]), h - 1)
            outputs.append([x1, y1, x2, y2, t.track_id, t.conf])
        return outputs
