"""NumPy scalar oracle of the spectral MCM megakernel.

A deliberately slow, branch-per-photon reimplementation of the semantics of
/root/reference/src/wgsl/renderers/MCMSpectralComputeRenderer.wgsl:107-179
(render) and :213-231 (reset), written float32-faithfully so the vectorized
JAX renderer can be validated against it (BASELINE north-star requirement).
It preserves the reference's quirks on purpose:

  - radiance initialized to 1.0 on full reset (white-before-convergence)
  - `globalIndex > arrayLength` off-by-one bound check (irrelevant here)
  - screen-position y-flip (2, -2)
  - volume/TF sampled with clamp-to-edge even when the position is already
    out of bounds (the OOB branch wins afterwards)
  - light gain 5.0; isotropic fallback when |light_direction| < EPS
  - per-frame state re-seeded from hash3(pixel.x, pixel.y, seed_bits)

Use tiny configs only (e.g. 16x16 pixels); this is O(python loop) slow.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

F = np.float32
U = np.uint32
EPS = F(1e-5)
TWOPI = F(6.28318530718)
_INV_U32_MAX = F(1.0) / F(np.float64(0xFFFFFFFF))


# -- scalar RNG chain ------------------------------------------------------
def pcg_hash(x: np.uint32) -> np.uint32:
    with np.errstate(over="ignore"):
        x = U(x * U(747796405) + U(2891336453))
        x = U(((x >> U((x >> U(28)) + U(4))) ^ x) * U(277803737))
        return U((x >> U(22)) ^ x)


def hash3(x, y, z) -> np.uint32:
    with np.errstate(over="ignore"):
        return pcg_hash(U(U(19) * U(x) + U(47) * U(y) + U(101) * U(z) + U(131)))


class Chain:
    """Mutable uint32 hash-chain state (the WGSL `state` pointer)."""

    def __init__(self, state: np.uint32):
        self.state = U(state)

    def uniform(self) -> np.float32:
        self.state = pcg_hash(self.state)
        return F(self.state) * _INV_U32_MAX

    def square(self):
        return self.uniform(), self.uniform()

    def disk(self):
        radius = np.sqrt(self.uniform())
        angle = TWOPI * self.uniform()
        return F(radius * np.cos(angle)), F(radius * np.sin(angle))

    def sphere(self):
        dx, dy = self.disk()
        norm = F(dx * dx + dy * dy)
        radius = F(2.0) * np.sqrt(max(F(1.0) - norm, F(0.0)))
        return F(radius * dx), F(radius * dy), F(F(1.0) - F(2.0) * norm)

    def exponential(self, rate: np.float32) -> np.float32:
        return F(-np.log(self.uniform()) / rate)


# -- texture sampling (clamp-to-edge, texel centers at half-integers) ------
def _lin_coords(u, n):
    t = F(u) * F(n) - F(0.5)
    i0 = int(np.floor(t))
    frac = F(t - F(i0))
    lo = min(max(i0, 0), n - 1)
    hi = min(max(i0 + 1, 0), n - 1)
    return lo, hi, frac


def sample_volume(density: np.ndarray, u, v, w) -> np.float32:
    D, H, W = density.shape
    x0, x1, fx = _lin_coords(u, W)
    y0, y1, fy = _lin_coords(v, H)
    z0, z1, fz = _lin_coords(w, D)
    c = density
    c00 = c[z0, y0, x0] + (c[z0, y0, x1] - c[z0, y0, x0]) * fx
    c01 = c[z0, y1, x0] + (c[z0, y1, x1] - c[z0, y1, x0]) * fx
    c10 = c[z1, y0, x0] + (c[z1, y0, x1] - c[z1, y0, x0]) * fx
    c11 = c[z1, y1, x0] + (c[z1, y1, x1] - c[z1, y1, x0]) * fx
    c0 = c00 + (c01 - c00) * fy
    c1 = c10 + (c11 - c10) * fy
    return F(c0 + (c1 - c0) * fz)


def sample_tex2d(tex: np.ndarray, u, v) -> np.ndarray:
    H, W, _ = tex.shape
    x0, x1, fx = _lin_coords(u, W)
    y0, y1, fy = _lin_coords(v, H)
    c0 = tex[y0, x0] + (tex[y0, x1] - tex[y0, x0]) * fx
    c1 = tex[y1, x0] + (tex[y1, x1] - tex[y1, x0]) * fx
    return (c0 + (c1 - c0) * fy).astype(F)


def sample_tex1d(tex: np.ndarray, u) -> np.float32:
    (N,) = tex.shape
    x0, x1, fx = _lin_coords(u, N)
    return F(tex[x0] + (tex[x1] - tex[x0]) * fx)


# -- geometry --------------------------------------------------------------
def intersect_cube(o, d):
    with np.errstate(divide="ignore", invalid="ignore"):
        tmin = (F(0.0) - o) / d
        tmax = (F(1.0) - o) / d
    t1 = np.minimum(tmin, tmax)
    t2 = np.maximum(tmin, tmax)
    return F(np.max(t1)), F(np.min(t2))


def unproject_rand(chain: Chain, sx, sy, inv_mvp, inv_res, blur):
    ox, oy = chain.disk()
    near = np.array([sx + ox * F(blur), sy + oy * F(blur), F(-1.0), F(1.0)], F)
    ax, ay = chain.square()
    far = np.array(
        [
            sx + (ax * F(2.0) - F(1.0)) * F(inv_res),
            sy + (ay * F(2.0) - F(1.0)) * F(inv_res),
            F(1.0),
            F(1.0),
        ],
        F,
    )
    fr = inv_mvp.astype(F) @ near
    to = inv_mvp.astype(F) @ far
    return (fr[:3] / fr[3]).astype(F), (to[:3] / to[3]).astype(F)


def sample_henyey_greenstein(chain: Chain, g, direction):
    u = np.array(chain.sphere(), F)
    if abs(g) < EPS:
        return u
    g = F(g)
    g2 = F(g * g)
    c = F((F(1.0) - g2) / (F(1.0) - g + F(2.0) * g * chain.uniform()))
    hgcos = F((F(1.0) + g2 - c * c) / (F(2.0) * g))
    circle = u - np.dot(u, direction) * direction
    circle = (circle / F(np.sqrt(np.dot(circle, circle)))).astype(F)
    return (
        np.sqrt(max(F(1.0) - hgcos * hgcos, F(0.0))) * circle + hgcos * direction
    ).astype(F)


# -- photon state ----------------------------------------------------------
@dataclass
class PhotonSpectral:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, F))
    direction: np.ndarray = field(default_factory=lambda: np.zeros(3, F))
    bounces: int = 0
    samples: int = 0
    bin: int = 0
    wavelength: np.float32 = F(0.0)
    radiance: np.ndarray = field(default_factory=lambda: np.zeros(12, F))
    transmittance: np.ndarray = field(default_factory=lambda: np.ones(12, F))


@dataclass
class OracleParams:
    """Everything the dispatch needs (uniforms + bound resources)."""

    inv_mvp: np.ndarray  # (4,4) f32
    resolution: int
    seed_bits: int  # uint32 bit pattern of the f32 frame seed
    blur: float = 0.0
    extinction: float = 1.0
    anisotropy: float = 0.0  # unused by spectral kernel (TF supplies g)
    max_bounces: int = 8
    steps: int = 8
    light_direction: np.ndarray = field(default_factory=lambda: np.array([1, 0, 0], F))
    density: np.ndarray = None  # (D,H,W) f32
    material_tf: np.ndarray = None  # (256,256,4) f32
    light_spectrum: np.ndarray = None  # (256,) f32
    spectrum_rep: np.ndarray = None  # flat f32 [n, bounds, x, y, z]
    max_n_bins: int = 12


def _screen_position(ix, iy, inv_res):
    sx = F((F(ix) + F(0.5)) * F(inv_res) - F(0.5)) * F(2.0)
    sy = F((F(iy) + F(0.5)) * F(inv_res) - F(0.5)) * F(-2.0)
    return sx, sy


def _set_wavelength(p: PhotonSpectral, wavelength, rep):
    p.wavelength = F(wavelength)
    n_bins = int(rep[0] + 0.5)
    p.bin = n_bins - 1
    for i in range(1, n_bins):
        if wavelength < rep[i + 1]:
            p.bin = i - 1
            break


def _reset(p: PhotonSpectral, chain: Chain, sx, sy, prm: OracleParams):
    fr, to = unproject_rand(chain, sx, sy, prm.inv_mvp, F(1.0) / F(prm.resolution), prm.blur)
    d = to - fr
    p.direction = (d / F(np.sqrt(np.dot(d, d)))).astype(F)
    p.bounces = 0
    tnear, _tfar = intersect_cube(fr, p.direction)
    tnear = max(tnear, F(0.0))
    p.position = (fr + tnear * p.direction).astype(F)
    p.transmittance = np.ones(prm.max_n_bins, F)
    rep = prm.spectrum_rep
    n_bins = int(rep[0] + 0.5)
    min_lam, max_lam = rep[1], rep[n_bins + 1]
    _set_wavelength(p, chain.uniform() * (max_lam - min_lam) + min_lam, rep)


def _full_reset(p: PhotonSpectral, chain: Chain, sx, sy, prm: OracleParams):
    _reset(p, chain, sx, sy, prm)
    p.samples = 0
    p.radiance = np.ones(prm.max_n_bins, F)


def _add_radiance(p: PhotonSpectral, radiance, rep):
    n_bins = int(rep[0] + 0.5)
    for i in range(n_bins):
        x = F(radiance) if i == p.bin else F(0.0)
        p.radiance[i] = p.radiance[i] + (x - p.radiance[i]) / F(p.samples)


def _sample_light(prm: OracleParams, d, wavelength):
    t = F((wavelength - F(400.0)) / F(300.0))
    intensity = F(sample_tex1d(prm.light_spectrum, t) * F(5.0))
    ld = prm.light_direction.astype(F)
    if np.sqrt(np.dot(ld, ld)) < EPS:
        return intensity
    ld = (ld / F(np.sqrt(np.dot(ld, ld)))).astype(F)
    return F(max(np.dot(d, ld) * intensity, F(0.0)))


def reset_dispatch(prm: OracleParams):
    """The reset pipeline: fresh photons for every pixel."""
    res = prm.resolution
    photons = [[None] * res for _ in range(res)]
    for iy in range(res):
        for ix in range(res):
            chain = Chain(hash3(ix, iy, prm.seed_bits))
            p = PhotonSpectral(
                radiance=np.ones(prm.max_n_bins, F),
                transmittance=np.ones(prm.max_n_bins, F),
            )
            sx, sy = _screen_position(ix, iy, F(1.0) / F(res))
            _full_reset(p, chain, sx, sy, prm)
            photons[iy][ix] = p
    return photons


def render_dispatch(photons, prm: OracleParams):
    """One render dispatch: `steps` Woodcock iterations per photon, then the
    per-pixel display conversion. Mutates and returns (photons, rgb_image)."""
    res = prm.resolution
    rep = prm.spectrum_rep
    image = np.zeros((res, res, 3), F)
    for iy in range(res):
        for ix in range(res):
            p: PhotonSpectral = photons[iy][ix]
            chain = Chain(hash3(ix, iy, prm.seed_bits))
            sx, sy = _screen_position(ix, iy, F(1.0) / F(res))
            for _ in range(prm.steps):
                dist = chain.exponential(F(prm.extinction))
                p.position = (p.position + dist * p.direction).astype(F)

                t = F((p.wavelength - F(400.0)) / F(300.0))
                d_val = sample_volume(prm.density, p.position[0], p.position[1], p.position[2])
                mat = sample_tex2d(prm.material_tf, t, d_val)
                albedo, alpha = F(mat[0]), F(mat[1])
                g = F(mat[2] * F(2.0) - F(1.0))

                p_null = F(F(1.0) - alpha)
                p_scatter = F(0.0) if p.bounces >= prm.max_bounces else F(alpha * albedo)
                p_absorb = F(F(1.0) - p_null - p_scatter)

                wheel = chain.uniform()
                oob = bool(np.any(p.position > F(1.0)) or np.any(p.position < F(0.0)))
                if oob:
                    radiance = _sample_light(prm, p.direction, p.wavelength)
                    p.samples += 1
                    _add_radiance(p, radiance, rep)
                    _reset(p, chain, sx, sy, prm)
                elif wheel < p_absorb:
                    p.samples += 1
                    _add_radiance(p, F(0.0), rep)
                    _reset(p, chain, sx, sy, prm)
                elif wheel < p_absorb + p_scatter:
                    p.direction = sample_henyey_greenstein(chain, g, p.direction)
                    p.bounces += 1
                # else: null collision

            image[iy, ix] = radiance_to_rgb(p, rep)
    return photons, image


def radiance_to_xyz(p: PhotonSpectral, rep):
    n_bins = int(rep[0] + 0.5)
    xyz = np.zeros(3, F)
    for i in range(n_bins):
        xyz += p.radiance[i] * np.array(
            [rep[2 + n_bins + i], rep[2 + 2 * n_bins + i], rep[2 + 3 * n_bins + i]], F
        )
    return xyz


def radiance_to_rgb(p: PhotonSpectral, rep):
    x, y, z = radiance_to_xyz(p, rep)
    return np.array(
        [
            F(3.240479) * x - F(1.537150) * y - F(0.498536) * z,
            F(-0.969255) * x + F(1.875990) * y + F(0.041556) * z,
            F(0.055647) * x - F(0.204041) * y + F(1.057311) * z,
        ],
        F,
    )
