"""Ground-truth odometry from TUM-format trajectory files.

== reference GUI/Tools/GroundTruthOdometry.{h,cpp} (and the
GroundTruthOdometryInterface consumed by '-init tf',
Core/Utils/GroundTruthOdometry.hpp): lines of
``timestamp tx ty tz qx qy qz qw``; poses are returned RELATIVE to the first
pose of the file, so the trajectory starts at identity like the engine's.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _quat_to_mat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    n = np.sqrt(x * x + y * y + z * z + w * w)
    x, y, z, w = x / n, y / n, z / n, w / n
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


class GroundTruthOdometry:
    def __init__(self, path: str, timestamp_scale: float = 1e9):
        """timestamp_scale: file seconds -> engine nanoseconds multiplier."""
        self.poses: Dict[int, np.ndarray] = {}
        self._first: Optional[np.ndarray] = None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                vals = [float(v) for v in line.replace(",", " ").split()]
                if len(vals) < 8:
                    continue
                ts = int(round(vals[0] * timestamp_scale))
                T = np.eye(4)
                T[:3, :3] = _quat_to_mat(np.asarray(vals[4:8]))
                T[:3, 3] = vals[1:4]
                self.poses[ts] = T
        if not self.poses:
            raise ValueError(f"no poses in {path}")
        self._keys = np.asarray(sorted(self.poses.keys()))
        self._first = self.poses[int(self._keys[0])]

    def get_incremental_transformation(self, timestamp: int) -> Optional[np.ndarray]:
        """Pose at (the nearest) timestamp, relative to the file's first pose."""
        i = int(np.searchsorted(self._keys, timestamp))
        if i >= len(self._keys):
            i = len(self._keys) - 1
        if i > 0 and abs(int(self._keys[i - 1]) - timestamp) <= abs(
            int(self._keys[i]) - timestamp
        ):
            i -= 1
        T = self.poses[int(self._keys[i])]
        return np.linalg.inv(self._first) @ T
