"""Configuration for the SLAM engine.

Replaces the reference's cv::FileStorage YAML parsing
(reference: src/Tracking.cc:87-211, Examples/Monocular/TUM1.yaml) with a
typed dataclass plus a parser that reads the reference's own YAML settings
files (so a user can bring their ORB-SLAM2 calibration file unchanged).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional

from ..geometry.camera import PinholeCamera


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extractor settings (reference YAML keys ORBextractor.*,
    Tracking.cc:164-211)."""
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # fixed-capacity budgets for static shapes (TPU-first addition)
    max_keypoints: int = 2048           # per-frame cap (>= n_features, incl. 2x mono init)
    cell_size: int = 32                 # FAST grid cell (reference uses 30: ORBextractor.cc:1424)
    edge_threshold: int = 19            # border (reference: ORBextractor.h EDGE_THRESHOLD 19)
    patch_size: int = 31


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Full system configuration."""
    camera: PinholeCamera = dataclasses.field(default_factory=lambda: PinholeCamera(
        fx=517.3, fy=516.5, cx=318.6, cy=255.3))
    orb: OrbConfig = dataclasses.field(default_factory=OrbConfig)
    fps: float = 30.0
    rgb: bool = True                    # input channel order flag (Camera.RGB)
    th_depth: float = 40.0              # close/far stereo point threshold (ThDepth)
    depth_map_factor: float = 5000.0    # RGB-D depth scaling (DepthMapFactor)

    # --- fixed-capacity state budgets (TPU-first; see SURVEY.md section 7) ---
    max_keyframes: int = 1500
    max_map_points: int = 120000
    max_obs_per_point: int = 24

    # keyframe policy (reference: Tracking.cc:124-130)
    @property
    def min_frames(self) -> int:
        return 0

    @property
    def max_frames(self) -> int:
        return int(self.fps)


_YAML_KV = re.compile(r"^\s*([A-Za-z0-9_.]+)\s*:\s*(.*?)\s*$")


def _parse_opencv_yaml(path: str) -> dict:
    """Minimal parser for the reference's OpenCV YAML settings files
    (flat `Key.Sub: value` pairs, '%YAML:1.0' header, '#' comments), plus
    `!!opencv-matrix` blocks (rows/cols/dt/data) used by the stereo
    rectification calibration in EuRoC settings (reference:
    Examples/Stereo/EuRoC.yaml:38-86) — parsed into numpy arrays."""
    import numpy as np

    out: dict = {}
    mat_key = None          # key of the opencv-matrix currently being parsed
    mat: dict = {}

    def finish_matrix():
        nonlocal mat_key, mat
        if mat_key is not None and "data" in mat:
            arr = np.asarray(mat["data"], dtype=np.float64)
            r, c = int(mat.get("rows", 1)), int(mat.get("cols", arr.size))
            out[mat_key] = arr.reshape(r, c)
        mat_key, mat = None, {}

    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.split("#", 1)[0].rstrip()
            if not line or line.startswith("%"):
                continue
            if mat_key is not None:
                # inside a matrix block: rows/cols/dt/data, data may span lines
                if "data_open" in mat:  # continuation of a data list
                    mat["data"].extend(
                        float(tok) for tok in re.findall(r"[-+0-9.eE]+", line))
                    if "]" in line:
                        del mat["data_open"]
                        finish_matrix()
                    continue
                m = _YAML_KV.match(line)
                if m and m.group(1) in ("rows", "cols", "dt", "data"):
                    k, v = m.group(1), m.group(2)
                    if k == "data":
                        mat["data"] = [float(t) for t in re.findall(r"[-+0-9.eE]+", v)]
                        if "]" not in v:
                            mat["data_open"] = True
                        else:
                            finish_matrix()
                    elif k in ("rows", "cols"):
                        mat[k] = int(v)
                    continue
                finish_matrix()  # block ended without data; fall through
            m = _YAML_KV.match(line)
            if not m:
                continue
            key, val = m.group(1), m.group(2)
            if "!!opencv-matrix" in val:
                mat_key, mat = key, {}
                continue
            if not val:
                continue
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val.strip("\"'")
        finish_matrix()
    return out


def load_settings_raw(path: str) -> dict:
    """All key/value pairs of a reference-format settings YAML, including
    `!!opencv-matrix` entries (LEFT.K etc.) as numpy arrays."""
    return _parse_opencv_yaml(path)


def load_settings_yaml(path: str, width: Optional[int] = None, height: Optional[int] = None) -> SlamConfig:
    """Build a SlamConfig from a reference-format YAML settings file."""
    d = _parse_opencv_yaml(path)
    cam = PinholeCamera(
        fx=float(d.get("Camera.fx", 500.0)),
        fy=float(d.get("Camera.fy", 500.0)),
        cx=float(d.get("Camera.cx", 320.0)),
        cy=float(d.get("Camera.cy", 240.0)),
        k1=float(d.get("Camera.k1", 0.0)),
        k2=float(d.get("Camera.k2", 0.0)),
        p1=float(d.get("Camera.p1", 0.0)),
        p2=float(d.get("Camera.p2", 0.0)),
        k3=float(d.get("Camera.k3", 0.0)),
        bf=float(d.get("Camera.bf", 0.0)),
        width=int(d.get("Camera.width", width or 640)),
        height=int(d.get("Camera.height", height or 480)),
    )
    n_feat = int(d.get("ORBextractor.nFeatures", 1000))
    orb = OrbConfig(
        n_features=n_feat,
        scale_factor=float(d.get("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(d.get("ORBextractor.nLevels", 8)),
        ini_th_fast=int(d.get("ORBextractor.iniThFAST", 20)),
        min_th_fast=int(d.get("ORBextractor.minThFAST", 7)),
        max_keypoints=max(2048, 2 * n_feat),
    )
    return SlamConfig(
        camera=cam,
        orb=orb,
        fps=float(d.get("Camera.fps", 30.0)),
        rgb=bool(d.get("Camera.RGB", 1)),
        th_depth=float(d.get("ThDepth", 40.0)),
        depth_map_factor=float(d.get("DepthMapFactor", 5000.0)),
    )
