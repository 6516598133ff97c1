"""Geo / circular math kernels (scalar-library parity, SURVEY.md §2.9).

Vectorized analogs of the reference's great-circle distance
(/root/reference/biosample_enricher/elevation/utils.py:6-38, duplicated in
metrics/evaluator.py:662-707) and the wind-direction circular vector mean
(weather/providers/open_meteo.py:205-219).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(
    lat1: np.ndarray, lon1: np.ndarray, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Great-circle distance in meters, vectorized over coordinate columns."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return EARTH_RADIUS_M * 2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def circular_mean_deg(degrees: np.ndarray) -> float:
    """Vector mean of angles in degrees, result in [0, 360)."""
    r = np.radians(np.asarray(degrees, dtype=np.float64))
    if r.size == 0:
        return float("nan")
    ang = float(np.degrees(np.arctan2(np.sin(r).mean(), np.cos(r).mean()))) % 360.0
    return 0.0 if ang >= 360.0 - 1e-9 else ang


def wrap_lon_0_360(lon: np.ndarray) -> np.ndarray:
    """Longitude wrap to [0, 360) (noaa_oisst.py:170 analog)."""
    return np.asarray(lon, dtype=np.float64) % 360.0
