"""System facade: the public entry point of the engine.

TPU-native redesign of src/System.cpp: constructs the map, tracker, local
mapper (and loop closer once present), wires them together, and exposes the
reference's public API surface (include/System.h:63-110):

    System(cfg).track_monocular(img, t) -> Tcw [3,4] or None
    track_stereo(left, right, t) / track_rgbd(rgb, depth, t)
    save_trajectory_tum / save_keyframe_trajectory_tum / save_trajectory_kitti
    reset() / shutdown()

The reference's thread triad (System.cpp:97-126) is a host-side pipeline:
tracking runs inline per frame; local mapping and loop closing run per
keyframe (synchronously by default; `async_mapping=True` defers them to a
background executor thread with a bounded queue — same structure as the
reference's InsertKeyFrame handoff, src/LocalMapping.cpp:147-153).
"""
from __future__ import annotations

import queue
import threading

import numpy as np

from .config import SlamConfig, Sensor
from .io import trajectory as traj_io
from .local_mapping import LocalMapper
from .map.mapstate import MapState
from .ops.features import padded_capacity
from .tracking import Tracker, TrackState


class System:
    def __init__(self, cfg: SlamConfig, async_mapping: bool = False):
        self.cfg = cfg
        n_feat = padded_capacity(
            cfg.orb.n_features * (2 if cfg.sensor == Sensor.MONOCULAR else 1))
        self.map = MapState(cfg, n_feat)
        self.local_mapper = LocalMapper(cfg, self.map)
        self.tracker = Tracker(cfg, self.map, self._mapper_proxy())
        self._async = async_mapping
        self._queue: queue.Queue | None = None
        self._worker: threading.Thread | None = None
        if async_mapping:
            self._queue = queue.Queue(maxsize=3)
            self._worker = threading.Thread(target=self._mapping_loop, daemon=True)
            self._worker.start()

    # --------------------------------------------------------------- pipeline
    def _mapper_proxy(self):
        sys_self = self

        class _Proxy:
            def process(self, kf):
                if sys_self._async:
                    sys_self._queue.put(kf)  # bounded: backpressure like the
                    # reference's <3 queue check (src/Tracking.cpp:1417)
                else:
                    sys_self.local_mapper.process(kf)

            def run_ba(self, *a, **kw):
                return sys_self.local_mapper.run_ba(*a, **kw)

        return _Proxy()

    def _mapping_loop(self):
        while True:
            kf = self._queue.get()
            if kf is None:
                return
            self.local_mapper.process(kf)

    # ------------------------------------------------------------- public API
    def track_monocular(self, img: np.ndarray, timestamp: float):
        assert self.cfg.sensor == Sensor.MONOCULAR
        return self.tracker.process_image(self._gray(img), timestamp)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray, timestamp: float):
        assert self.cfg.sensor == Sensor.RGBD
        return self.tracker.process_image(self._gray(img), timestamp,
                                          depth_map=depth)

    def track_stereo(self, left: np.ndarray, right: np.ndarray,
                     timestamp: float):
        assert self.cfg.sensor == Sensor.STEREO
        return self.tracker.process_image(self._gray(left), timestamp,
                                          right_img=self._gray(right))

    @staticmethod
    def _gray(img: np.ndarray) -> np.ndarray:
        if img.ndim == 3:
            img = img @ np.array([0.299, 0.587, 0.114], np.float32)
        return img.astype(np.float32)

    # ------------------------------------------------------------------ state
    @property
    def tracking_state(self) -> TrackState:
        return self.tracker.state

    def map_stats(self) -> dict:
        return {
            "keyframes": self.map.n_keyframes,
            "points": self.map.n_points,
            "state": self.tracker.state.name,
            "last_inliers": self.tracker.matches_inliers,
        }

    def shutdown(self):
        if self._async and self._queue is not None:
            self._queue.put(None)
            self._worker.join(timeout=30)

    def reset(self):
        """System::Reset (src/System.cpp:279; Tracking::Reset :2030)."""
        n_feat = self.map.kf_xy.shape[1]
        self.map = MapState(self.cfg, n_feat)
        self.local_mapper = LocalMapper(self.cfg, self.map)
        self.tracker = Tracker(self.cfg, self.map, self._mapper_proxy())

    # -------------------------------------------------------------- trajectory
    def save_trajectory_tum(self, path):
        ts, poses = self.tracker.trajectory()
        traj_io.save_tum(path, ts, poses)

    def save_keyframe_trajectory_tum(self, path):
        ids = self.map.kf_ids
        order = ids[np.argsort(self.map.kf_timestamp[ids])]
        traj_io.save_tum(path, self.map.kf_timestamp[order],
                         self.map.kf_pose[order])

    def save_trajectory_kitti(self, path):
        ts, poses = self.tracker.trajectory()
        traj_io.save_kitti(path, poses)
