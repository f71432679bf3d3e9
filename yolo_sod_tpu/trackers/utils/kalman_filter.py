"""Kalman filters for box tracking (reference trackers/utils/kalman_filter.py).

Constant-velocity 8-state filters over (x, y, a, h) — aspect-ratio form,
ByteTrack — and (x, y, w, h) — BoT-SORT. Pure numpy; tracking runs host-side
after the device produces detections, exactly like the reference.
"""

from __future__ import annotations

import numpy as np

# 0.95 / 0.99 chi-square quantiles for gating distance, by measurement dim.
chi2inv95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877,
             5: 11.070, 6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919}


class KalmanFilterXYAH:
    """State: [x, y, a, h, vx, vy, va, vh]; measurement: [x, y, a, h]."""

    ndim = 4

    def __init__(self):
        dt = 1.0
        self._motion_mat = np.eye(8)
        for i in range(4):
            self._motion_mat[i, 4 + i] = dt
        self._update_mat = np.eye(4, 8)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def _std_pos(self, m):
        return [2 * self._std_weight_position * m[3],
                2 * self._std_weight_position * m[3],
                1e-2,
                2 * self._std_weight_position * m[3]]

    def _std_vel(self, m):
        return [10 * self._std_weight_velocity * m[3],
                10 * self._std_weight_velocity * m[3],
                1e-5,
                10 * self._std_weight_velocity * m[3]]

    def initiate(self, measurement):
        mean = np.r_[measurement, np.zeros(4)]
        std = self._std_pos(measurement) + self._std_vel(measurement)
        covariance = np.diag(np.square(std))
        return mean, covariance

    def predict(self, mean, covariance):
        std_pos = [self._std_weight_position * mean[3],
                   self._std_weight_position * mean[3],
                   1e-2,
                   self._std_weight_position * mean[3]]
        std_vel = [self._std_weight_velocity * mean[3],
                   self._std_weight_velocity * mean[3],
                   1e-5,
                   self._std_weight_velocity * mean[3]]
        motion_cov = np.diag(np.square(np.r_[std_pos, std_vel]))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def multi_predict(self, mean, covariance):
        """Vectorized predict over N tracks: mean (N, 8), covariance (N, 8, 8)."""
        std_pos = np.stack([self._std_weight_position * mean[:, 3],
                            self._std_weight_position * mean[:, 3],
                            np.full(len(mean), 1e-2),
                            self._std_weight_position * mean[:, 3]], 1)
        std_vel = np.stack([self._std_weight_velocity * mean[:, 3],
                            self._std_weight_velocity * mean[:, 3],
                            np.full(len(mean), 1e-5),
                            self._std_weight_velocity * mean[:, 3]], 1)
        sqr = np.square(np.concatenate([std_pos, std_vel], 1))
        motion_cov = np.stack([np.diag(s) for s in sqr])
        mean = mean @ self._motion_mat.T
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance):
        std = [self._std_weight_position * mean[3],
               self._std_weight_position * mean[3],
               1e-1,
               self._std_weight_position * mean[3]]
        innovation_cov = np.diag(np.square(std))
        mean = self._update_mat @ mean
        covariance = self._update_mat @ covariance @ self._update_mat.T
        return mean, covariance + innovation_cov

    def update(self, mean, covariance, measurement):
        projected_mean, projected_cov = self.project(mean, covariance)
        chol = np.linalg.cholesky(projected_cov)
        kalman_gain = np.linalg.solve(
            chol.T, np.linalg.solve(chol, (covariance @ self._update_mat.T).T)).T
        innovation = measurement - projected_mean
        new_mean = mean + kalman_gain @ innovation
        new_cov = covariance - kalman_gain @ projected_cov @ kalman_gain.T
        return new_mean, new_cov

    # ---- batched forms (array-first tracker store) -------------------------

    def _multi_std_proj(self, mean):
        """Projection stds for (N, 8) means -> (N, 4)."""
        pw = self._std_weight_position
        h = mean[:, 3]
        return np.stack([pw * h, pw * h, np.full(len(mean), 1e-1), pw * h], 1)

    def multi_initiate(self, measurements):
        """Vectorized initiate: (N, 4) measurements -> (N, 8), (N, 8, 8)."""
        n = len(measurements)
        mean = np.concatenate([measurements, np.zeros((n, 4))], 1)
        pw, vw = 2 * self._std_weight_position, 10 * self._std_weight_velocity
        h = measurements[:, 3]
        std = np.stack([pw * h, pw * h, np.full(n, 1e-2), pw * h,
                        vw * h, vw * h, np.full(n, 1e-5), vw * h], 1)
        cov = np.einsum("ni,ij->nij", np.square(std), np.eye(8))
        return mean, cov

    def multi_project(self, mean, covariance):
        """Vectorized project: (N, 8), (N, 8, 8) -> (N, 4), (N, 4, 4)."""
        std = self._multi_std_proj(mean)
        inno = np.einsum("ni,ij->nij", np.square(std), np.eye(4))
        return mean[:, :4].copy(), covariance[:, :4, :4] + inno

    def multi_update(self, mean, covariance, measurements):
        """Vectorized KF update over N tracks (same math as `update`)."""
        proj_mean, proj_cov = self.multi_project(mean, covariance)
        b = np.transpose(covariance[:, :, :4], (0, 2, 1))      # (N, 4, 8) = (P Hᵀ)ᵀ
        gain = np.transpose(np.linalg.solve(proj_cov, b), (0, 2, 1))  # (N, 8, 4)
        innovation = measurements - proj_mean
        new_mean = mean + np.einsum("nij,nj->ni", gain, innovation)
        new_cov = covariance - gain @ proj_cov @ np.transpose(gain, (0, 2, 1))
        return new_mean, new_cov

    def gating_distance(self, mean, covariance, measurements,
                        only_position: bool = False, metric: str = "maha"):
        mean, covariance = self.project(mean, covariance)
        if only_position:
            mean, covariance = mean[:2], covariance[:2, :2]
            measurements = measurements[:, :2]
        d = measurements - mean
        if metric == "gaussian":
            return np.sum(d * d, axis=1)
        chol = np.linalg.cholesky(covariance)
        z = np.linalg.solve(chol, d.T)
        return np.sum(z * z, axis=0)


class KalmanFilterXYWH(KalmanFilterXYAH):
    """State: [x, y, w, h, ...]; the w-channel scales like h (BoT-SORT)."""

    def _stds(self, m, pw, vw):
        return ([pw * m[2], pw * m[3], pw * m[2], pw * m[3]],
                [vw * m[2], vw * m[3], vw * m[2], vw * m[3]])

    def initiate(self, measurement):
        p, v = self._stds(measurement, 2 * self._std_weight_position,
                          10 * self._std_weight_velocity)
        mean = np.r_[measurement, np.zeros(4)]
        return mean, np.diag(np.square(p + v))

    def predict(self, mean, covariance):
        p, v = self._stds(mean, self._std_weight_position, self._std_weight_velocity)
        motion_cov = np.diag(np.square(np.r_[p, v]))
        mean = self._motion_mat @ mean
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def multi_predict(self, mean, covariance):
        pw, vw = self._std_weight_position, self._std_weight_velocity
        std_pos = np.stack([pw * mean[:, 2], pw * mean[:, 3],
                            pw * mean[:, 2], pw * mean[:, 3]], 1)
        std_vel = np.stack([vw * mean[:, 2], vw * mean[:, 3],
                            vw * mean[:, 2], vw * mean[:, 3]], 1)
        sqr = np.square(np.concatenate([std_pos, std_vel], 1))
        motion_cov = np.stack([np.diag(s) for s in sqr])
        mean = mean @ self._motion_mat.T
        covariance = self._motion_mat @ covariance @ self._motion_mat.T + motion_cov
        return mean, covariance

    def project(self, mean, covariance):
        pw = self._std_weight_position
        std = [pw * mean[2], pw * mean[3], pw * mean[2], pw * mean[3]]
        innovation_cov = np.diag(np.square(std))
        m = self._update_mat @ mean
        c = self._update_mat @ covariance @ self._update_mat.T
        return m, c + innovation_cov

    def _multi_std_proj(self, mean):
        pw = self._std_weight_position
        w, h = mean[:, 2], mean[:, 3]
        return np.stack([pw * w, pw * h, pw * w, pw * h], 1)

    def multi_initiate(self, measurements):
        n = len(measurements)
        mean = np.concatenate([measurements, np.zeros((n, 4))], 1)
        pw, vw = 2 * self._std_weight_position, 10 * self._std_weight_velocity
        w, h = measurements[:, 2], measurements[:, 3]
        std = np.stack([pw * w, pw * h, pw * w, pw * h,
                        vw * w, vw * h, vw * w, vw * h], 1)
        cov = np.einsum("ni,ij->nij", np.square(std), np.eye(8))
        return mean, cov
