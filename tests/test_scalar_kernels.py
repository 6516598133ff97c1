"""Unit tests for scalar-library parity kernels (SURVEY.md §2.9)."""

import numpy as np
import pyarrow as pa

from biosample_enricher_ray.functions.geo import (
    circular_mean_deg,
    haversine_m,
    wrap_lon_0_360,
)
from biosample_enricher_ray.functions.hashing import canonicalize_url


def test_haversine_known_distances():
    # London -> Paris ≈ 343.5 km
    d = haversine_m(np.array([51.5074]), np.array([-0.1278]),
                    np.array([48.8566]), np.array([2.3522]))
    assert abs(d[0] - 343_500) < 2_000
    # zero distance
    assert haversine_m(np.array([10.0]), np.array([20.0]),
                       np.array([10.0]), np.array([20.0]))[0] == 0.0
    # antipodal ≈ half circumference
    d = haversine_m(np.array([0.0]), np.array([0.0]),
                    np.array([0.0]), np.array([180.0]))
    assert abs(d[0] - np.pi * 6_371_000) < 1_000


def test_circular_mean():
    # 350° and 10° average to 0°, not 180°
    assert abs(circular_mean_deg(np.array([350.0, 10.0]))) < 1e-9
    assert abs(circular_mean_deg(np.array([90.0, 180.0])) - 135.0) < 1e-9
    assert np.isnan(circular_mean_deg(np.array([])))


def test_wrap_lon():
    assert list(wrap_lon_0_360(np.array([-10.0, 370.0, 180.0]))) == [350.0, 10.0, 180.0]


def test_canonicalize_url():
    urls = pa.array([
        "HTTPS://Example.COM:443/Path/",
        "http://example.com:80/a",
        "http://example.com:8080/a",
        "https://example.com/x#frag",
        "not a url",
    ])
    out = canonicalize_url(urls).to_pylist()
    assert out[0] == "https://example.com/Path"
    assert out[1] == "http://example.com/a"
    assert out[2] == "http://example.com:8080/a"
    assert out[3] == "https://example.com/x"
    assert out[4] is None
