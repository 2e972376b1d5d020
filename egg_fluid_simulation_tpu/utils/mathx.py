"""Scalar/vector math helpers mirroring the reference's ``math.lua`` extensions.

The reference injects small helpers into Lua's ``math`` table
(``/root/reference/math.lua:1-134``). Here they exist in two flavors:

- plain-Python versions (used by host-side code: config validation, Path, batch
  creation) and
- ``jnp``-traced versions (suffix-free, they accept arrays) used inside jitted
  solver code where it matters.

EPS matches the reference's ``math.eps = 1e-8`` (math.lua:2) — it is used as
both a float-comparison epsilon and a divide-by-zero guard throughout the
solver, so the value is load-bearing for fidelity.
"""

from __future__ import annotations

import math as _pymath

import jax.numpy as jnp

EPS = 1e-8  # reference math.lua:2

__all__ = [
    "EPS", "clamp", "mix", "mix2", "round_half_up", "normalize2", "magnitude",
    "dot2", "cross2", "distance", "squared_distance", "is_nan", "fract", "wrap",
    "jnp_clamp", "jnp_mix", "jnp_normalize2", "jnp_magnitude",
]


# ---------------------------------------------------------------- host-side --

def clamp(x, lo, hi):
    """Clamp to [lo, hi] (math.lua:16-26)."""
    return lo if x < lo else hi if x > hi else x


def mix(lower, upper, ratio):
    """Linear interpolation (math.lua:33-35)."""
    return lower * (1 - ratio) + upper * ratio


def mix2(x1, y1, x2, y2, ratio):
    """Interpolate two 2D points (math.lua:44-47)."""
    return mix(x1, x2, ratio), mix(y1, y2, ratio)


def round_half_up(x):
    """Round to nearest integer, .5 up (math.lua:7-9)."""
    return _pymath.floor(x + 0.5)


def magnitude(x, y):
    """2D vector length (math.lua:66-68)."""
    return _pymath.sqrt(x * x + y * y)


def normalize2(x, y):
    """Normalize 2D vector; returns (0, 0) when |v| < EPS (math.lua:54-61)."""
    m = magnitude(x, y)
    if m < EPS:
        return 0.0, 0.0
    return x / m, y / m


def dot2(x1, y1, x2, y2):
    return x1 * x2 + y1 * y2


def cross2(x1, y1, x2, y2):
    return x1 * y2 - y1 * x2


def distance(x1, y1, x2, y2):
    return magnitude(x2 - x1, y2 - y1)


def squared_distance(x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    return dx * dx + dy * dy


def is_nan(x) -> bool:
    return x != x


def fract(x):
    return x - _pymath.floor(x)


def wrap(index, n_elements):
    """Wrap a 1-based index into [1, n] (math.lua:126-129)."""
    if n_elements == 0:
        return index
    return ((index - 1) % n_elements) + 1


# -------------------------------------------------------------- device-side --

def jnp_clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def jnp_mix(lower, upper, ratio):
    return lower * (1 - ratio) + upper * ratio


def jnp_magnitude(v, axis=-1):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def jnp_normalize2(v, axis=-1):
    """Normalize with the reference's zero-vector convention: |v| < EPS -> 0."""
    m = jnp_magnitude(v, axis=axis)
    safe = jnp.maximum(m, EPS)
    out = v / jnp.expand_dims(safe, axis)
    return jnp.where(jnp.expand_dims(m, axis) < EPS, jnp.zeros_like(out), out), m
