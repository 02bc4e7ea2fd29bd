"""The complete hash / distribution library from the reference's RNG mixins.

Parity targets: /root/reference/src/glsl/mixins/random/hash/*.glsl (pcg,
xxhash, lcg, wang, jenkins, xorshift, bbs + squash{linear,nested,xor}
combiners) and .../distribution/*.glsl (uniformdivision, uniformcast,
square, disk, circle, sphere, hemisphere, ball, normal, exponential).

`ops/sampling.py` hosts the hot-path masked-draw machinery built on pcg +
squashlinear (what the renderers use); this module is the full library —
vectorized, selectable by key — for parity testing and experimentation.
All hashes map uint32 lanes -> uint32 lanes.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

HASHES: Dict[str, Callable] = {}
DISTRIBUTIONS: Dict[str, Callable] = {}


def _hash(key):
    def wrap(fn):
        HASHES[key] = fn
        return fn

    return wrap


def _dist(key):
    def wrap(fn):
        DISTRIBUTIONS[key] = fn
        return fn

    return wrap


def _u(v):
    return np.uint32(v)


@_hash("pcg")
def pcg(x):
    x = x.astype(jnp.uint32)
    x = x * _u(747796405) + _u(2891336453)
    x = ((x >> ((x >> _u(28)) + _u(4))) ^ x) * _u(277803737)
    return (x >> _u(22)) ^ x


@_hash("xxhash")
def xxhash(x):
    x = x.astype(jnp.uint32) + _u(374761393)
    x = _u(668265263) * ((x << _u(17)) | (x >> _u(15)))
    x = _u(2246822519) * (x ^ (x >> _u(15)))
    x = _u(3266489917) * (x ^ (x >> _u(13)))
    return x ^ (x >> _u(16))


@_hash("lcg")
def lcg(x):
    return x.astype(jnp.uint32) * _u(1664525) + _u(1013904223)


@_hash("wang")
def wang(x):
    x = x.astype(jnp.uint32)
    x = (x ^ _u(61)) ^ (x >> _u(16))
    x = x * _u(9)
    x = x ^ (x >> _u(4))
    x = x * _u(0x27D4EB2D)
    return x ^ (x >> _u(15))


@_hash("jenkins")
def jenkins(x):
    x = x.astype(jnp.uint32)
    x = x + (x << _u(10))
    x = x ^ (x >> _u(6))
    x = x + (x << _u(3))
    x = x ^ (x >> _u(11))
    return x + (x << _u(15))


@_hash("xorshift")
def xorshift(x):
    x = x.astype(jnp.uint32)
    x = x ^ (x << _u(13))
    x = x ^ (x >> _u(17))
    return x ^ (x << _u(5))


@_hash("bbs")
def bbs(x):
    x = x.astype(jnp.uint32) % _u(65521)
    x = (x * x) % _u(65521)
    return (x * x) % _u(65521)


# -- multi-component squash combiners (parameterized by the base hash) -----
def squash_linear(h, *components):
    weights = (19, 47, 101, 131)
    offsets = {2: 101, 3: 131, 4: 173}
    acc = jnp.zeros_like(components[0].astype(jnp.uint32))
    for w, c in zip(weights, components):
        acc = acc + _u(w) * c.astype(jnp.uint32)
    return h(acc + _u(offsets[len(components)]))


def squash_nested(h, *components):
    acc = h(components[0].astype(jnp.uint32))
    for c in components[1:]:
        acc = h(acc + c.astype(jnp.uint32))
    return acc


def squash_xor(h, *components):
    acc = components[0].astype(jnp.uint32)
    for c in components[1:]:
        acc = acc ^ h(c.astype(jnp.uint32))
    return h(acc)


# -- uniform mappers -------------------------------------------------------
_INV_U32_MAX = np.float32(1.0) / np.float32(np.float64(0xFFFFFFFF))


def uniform_division(state):
    return state.astype(jnp.float32) * _INV_U32_MAX


def uniform_cast(state):
    """Mantissa-cast uniform: bits in [1,2) minus 1 (uniformcast.glsl)."""
    bits = (state & _u(0x007FFFFF)) | _u(0x3F800000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32) - 1.0


# -- distributions (hash-parameterized chains, unmasked) -------------------
def _chain(h, state, n):
    """Advance n times, returning (state, [u1..un])."""
    us = []
    for _ in range(n):
        state = h(state)
        us.append(uniform_division(state))
    return state, us


@_dist("square")
def square(h, state):
    state, (x, y) = _chain(h, state, 2)
    return state, (x, y)


@_dist("circle")
def circle(h, state):
    state, (u,) = _chain(h, state, 1)
    angle = np.float32(2 * np.pi) * u
    return state, (jnp.cos(angle), jnp.sin(angle))


@_dist("disk")
def disk(h, state):
    state, (u1, u2) = _chain(h, state, 2)
    r = jnp.sqrt(u1)
    angle = np.float32(2 * np.pi) * u2
    return state, (r * jnp.cos(angle), r * jnp.sin(angle))


@_dist("sphere")
def sphere(h, state):
    state, (dx, dy) = disk(h, state)
    norm = dx * dx + dy * dy
    radius = 2.0 * jnp.sqrt(jnp.maximum(1.0 - norm, 0.0))
    return state, (radius * dx, radius * dy, 1.0 - 2.0 * norm)


@_dist("hemisphere")
def hemisphere(h, state):
    state, (u, u2) = _chain(h, state, 2)
    radius = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    angle = np.float32(2 * np.pi) * u2
    return state, (radius * jnp.cos(angle), radius * jnp.sin(angle), u)


@_dist("ball")
def ball(h, state):
    state, (u1, u2, u3) = _chain(h, state, 3)
    z = 1.0 - 2.0 * u1
    angle = np.float32(2 * np.pi) * u2
    radius = u3 ** (1.0 / 3.0)
    height = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return state, (radius * height * jnp.cos(angle),
                   radius * height * jnp.sin(angle), radius * z)


@_dist("normal")
def normal(h, state):
    state, (u1, u2) = _chain(h, state, 2)
    radius = jnp.sqrt(-2.0 * jnp.log(u1))
    angle = np.float32(2 * np.pi) * u2
    return state, radius * jnp.cos(angle)


@_dist("exponential")
def exponential(h, state, rate=1.0):
    state, (u,) = _chain(h, state, 1)
    return state, -jnp.log(u) / rate
