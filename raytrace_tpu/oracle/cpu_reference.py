"""CPU oracle: an independent numpy float64 mini-renderer.

Stands in for the pbrt-v2 CPU reference the original repo renders against
(SURVEY.md §4: "pbrt-v2 as golden reference"). Deliberately written as a
straight-line scalar-ish numpy implementation — a different code path from
the JAX framework — so `allclose` comparisons are meaningful.

Covers: perspective camera (pbrt projection math), ray–{triangle, sphere,
disk} intersection, point + disk-area lights, Lambert/mirror/glass shading,
shadow rays, direct lighting, and photon gathering by brute-force radius
search (for photon-map parity tests).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Scene description (plain python, float64)
# ---------------------------------------------------------------------------

@dataclass
class OTriangle:
    v0: np.ndarray
    v1: np.ndarray
    v2: np.ndarray
    mat: int
    light: int = -1
    # default UVs match the renderer (cudatrianglemesh.cu:27-33)
    uv0: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0]))
    uv1: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.0]))
    uv2: np.ndarray = field(default_factory=lambda: np.array([0.0, 1.0]))


@dataclass
class OSphere:
    center: np.ndarray  # translation(+uniform-scale) o2w ONLY — build via
    radius: float       # osphere_from_o2w to get the loud guard
    mat: int
    light: int = -1


def osphere_from_o2w(o2w, radius: float, mat: int, light: int = -1) -> "OSphere":
    """Oracle sphere from a framework object-to-world affine [3|4, 4].

    The oracle's analytic sphere supports translation + uniform scale only;
    framework spheres take arbitrary affines (ops/intersect.py) — a rotated
    or non-uniformly scaled o2w here would otherwise SILENTLY compare
    against a wrong oracle (VERDICT r2 weak #8), so any such transform
    raises instead."""
    o2w = np.asarray(o2w, np.float64)
    m = o2w[:3, :3]
    s = float(np.cbrt(abs(np.linalg.det(m))))
    if s <= 0.0 or not np.allclose(m, np.eye(3) * s, atol=1e-6 * max(1.0, s)):
        raise ValueError(
            "oracle spheres support translation + uniform-scale o2w only; "
            f"got linear part {m.tolist()}"
        )
    return OSphere(center=o2w[:3, 3].copy(), radius=radius * s, mat=mat,
                   light=light)


@dataclass
class ODisk:
    o: np.ndarray
    x: np.ndarray  # radius-scaled axes
    y: np.ndarray
    z: np.ndarray  # unit normal
    inner: float  # normalized
    phi_max: float
    mat: int
    light: int = -1


@dataclass
class OMaterial:
    mtype: int  # 0 matte, 1 mirror, 2 glass
    kd: np.ndarray = field(default_factory=lambda: np.array([0.5, 0.5, 0.5]))
    eta: float = 1.5
    tex_type: int = 0  # 0 constant, 1 checker (shading/material.py seam)
    tex_scale: float = 1.0


TEX_CHECKER_LO = 0.25


def mat_kd(mat: OMaterial, uv) -> np.ndarray:
    """Texture-modulated albedo (mirrors shading/material.texture_eval)."""
    if mat.tex_type == 1 and uv is not None:
        cell = math.floor(uv[0] * mat.tex_scale) + math.floor(
            uv[1] * mat.tex_scale)
        if cell % 2 != 0:
            return mat.kd * TEX_CHECKER_LO
    return mat.kd


@dataclass
class OLight:
    ltype: int  # 0 point, 1 area disk, 2 distant
    o: np.ndarray
    intensity: np.ndarray
    p1: np.ndarray = field(default_factory=lambda: np.zeros(3))
    p2: np.ndarray = field(default_factory=lambda: np.zeros(3))
    normal: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0]))
    area: float = 0.0


@dataclass
class OScene:
    triangles: list
    spheres: list
    disks: list
    materials: list
    lights: list


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------

def _norm(v):
    return v / np.linalg.norm(v)


def intersect_one(scene: OScene, o, d, tmin, tmax):
    """Closest hit for a single ray. Returns dict or None."""
    best = None
    bt = tmax
    for tri in scene.triangles:
        hit = _hit_tri(tri, o, d, tmin, bt)
        if hit is not None:
            bt = hit["t"]
            best = hit
    for sph in scene.spheres:
        hit = _hit_sphere(sph, o, d, tmin, bt)
        if hit is not None:
            bt = hit["t"]
            best = hit
    for dk in scene.disks:
        hit = _hit_disk(dk, o, d, tmin, bt)
        if hit is not None:
            bt = hit["t"]
            best = hit
    return best


def _hit_tri(tri: OTriangle, o, d, tmin, tmax):
    # plane + inside-test formulation (different from Möller–Trumbore)
    n = np.cross(tri.v1 - tri.v0, tri.v2 - tri.v0)
    denom = np.dot(n, d)
    if denom == 0.0:
        return None
    t = np.dot(n, tri.v0 - o) / denom
    if not (tmin < t < tmax):
        return None
    p = o + t * d
    # barycentric via areas
    n2 = np.dot(n, n)
    beta = np.dot(np.cross(p - tri.v0, tri.v2 - tri.v0), n) / n2
    gamma = np.dot(np.cross(tri.v1 - tri.v0, p - tri.v0), n) / n2
    if beta < 0 or gamma < 0 or beta + gamma > 1:
        return None
    ng = _norm(n)
    uv = ((1.0 - beta - gamma) * tri.uv0 + beta * tri.uv1
          + gamma * tri.uv2)
    return dict(t=t, p=p, ng=ng, ns=ng, mat=tri.mat, light=tri.light,
                dpdu=_any_tangent(ng), uv=uv)


def _hit_sphere(sph: OSphere, o, d, tmin, tmax):
    oc = o - sph.center
    a = np.dot(d, d)
    b = 2 * np.dot(d, oc)
    c = np.dot(oc, oc) - sph.radius**2
    disc = b * b - 4 * a * c
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    for t in sorted([(-b - sq) / (2 * a), (-b + sq) / (2 * a)]):
        if tmin < t < tmax:
            p = o + t * d
            ng = _norm(p - sph.center)
            # reference dpdu: (-n.y, n.x, 0) (cudasphere.cu:47)
            dpdu = np.array([-ng[1], ng[0], 0.0])
            if np.linalg.norm(dpdu) < 1e-12:
                dpdu = _any_tangent(ng)
            return dict(t=t, p=p, ng=ng, ns=ng, mat=sph.mat, light=sph.light,
                        dpdu=dpdu)
    return None


def _hit_disk(dk: ODisk, o, d, tmin, tmax):
    denom = np.dot(dk.z, d)
    if denom == 0.0:
        return None
    t = np.dot(dk.z, dk.o - o) / denom
    if not (tmin < t < tmax):
        return None
    p = o + t * d
    local = p - dk.o
    lx = np.dot(local, dk.x) / np.dot(dk.x, dk.x)
    ly = np.dot(local, dk.y) / np.dot(dk.y, dk.y)
    dist2 = lx * lx + ly * ly
    if dist2 > 1.0 or dist2 < dk.inner**2:
        return None
    phi = math.atan2(ly, lx)
    if phi < 0:
        phi += 2 * math.pi
    if phi > dk.phi_max:
        return None
    dpdu = -ly * dk.x + lx * dk.y
    if np.linalg.norm(dpdu) < 1e-12:
        dpdu = _any_tangent(dk.z)
    return dict(t=t, p=p, ng=dk.z.copy(), ns=dk.z.copy(), mat=dk.mat,
                light=dk.light, dpdu=dpdu)


def _any_tangent(n):
    if abs(n[0]) > abs(n[1]):
        v = np.array([-n[2], 0.0, n[0]])
    else:
        v = np.array([0.0, n[2], -n[1]])
    return _norm(v)


def occluded_one(scene: OScene, o, d, tmin, tmax) -> bool:
    return intersect_one(scene, o, d, tmin, tmax) is not None


# ---------------------------------------------------------------------------
# Camera (pbrt perspective projection, float64)
# ---------------------------------------------------------------------------

def camera_ray(cam_to_world, fov_deg, width, height, image_x, image_y):
    aspect = width / height
    if aspect > 1.0:
        x0, x1, y0, y1 = -aspect, aspect, -1.0, 1.0
    else:
        x0, x1, y0, y1 = -1.0, 1.0, -1.0 / aspect, 1.0 / aspect
    n_, f_ = 1e-2, 1000.0
    persp = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, f_ / (f_ - n_), -f_ * n_ / (f_ - n_)],
         [0, 0, 1, 0]], dtype=np.float64)
    inv_tan = 1.0 / math.tan(math.radians(fov_deg) / 2)
    cam_to_screen = np.diag([inv_tan, inv_tan, 1.0, 1.0]) @ persp
    screen_to_raster = (
        np.diag([width, height, 1.0, 1.0])
        @ np.diag([1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0, 1.0])
        @ np.array([[1, 0, 0, -x0], [0, 1, 0, -y1], [0, 0, 1, 0], [0, 0, 0, 1.0]])
    )
    raster_to_cam = np.linalg.inv(cam_to_screen) @ np.linalg.inv(screen_to_raster)
    ph = raster_to_cam @ np.array([image_x, image_y, 0.0, 1.0])
    p_cam = ph[:3] / ph[3]
    d_cam = _norm(p_cam)
    c2w = np.asarray(cam_to_world, np.float64)
    o = c2w[:3, 3].copy()
    d = c2w[:3, :3] @ d_cam
    return o, d


# ---------------------------------------------------------------------------
# Shading
# ---------------------------------------------------------------------------

def direct_light_at(scene: OScene, hit, wo, shadow_eps=1e-3,
                    area_samples: Optional[list] = None,
                    include_emitted: bool = True):
    """Direct lighting matching the photon renderer's directLight
    (raytracing.cu:49-84): emitted + per-light sampled contribution.
    area_samples: optional list of [n_s, 2] arrays per light for area lights
    (deterministic tests pass fixed u's)."""
    L = np.zeros(3)
    mat = scene.materials[hit["mat"]]
    if include_emitted and hit["light"] >= 0:
        lt = scene.lights[hit["light"]]
        if np.dot(lt.normal, wo) > 0:  # front face (cudalight.cu.h:128-138)
            L += lt.intensity
    for i, lt in enumerate(scene.lights):
        if lt.ltype == 0:  # point
            samples = [None]
        else:
            samples = area_samples[i] if area_samples else [np.array([0.5, 0.5])]
        ns_count = len(samples)
        for u in samples:
            li, uwi, pdf = sample_L_illum(lt, hit["p"], u)
            if pdf <= 0 or np.all(li == 0):
                continue
            if occluded_one(scene, hit["p"], uwi, shadow_eps, 1.0 - shadow_eps):
                continue
            wi = _norm(uwi)
            kd = mat_kd(mat, hit.get("uv"))
            f = kd / math.pi if mat.mtype == 0 else np.zeros(3)
            L += abs(np.dot(hit["ns"], wi)) * f * li / (pdf * ns_count)
    return L


def sample_L_illum(lt: OLight, p, u):
    if lt.ltype == 0:
        uwi = lt.o - p
        return lt.intensity / np.dot(uwi, uwi), uwi, 1.0
    if lt.ltype == 2:  # distant: li = L, pdf 1, shadow extent 2·world radius
        r_w = math.sqrt(max(lt.area, 1e-20) / math.pi)
        return lt.intensity.copy(), -lt.normal * (2.0 * r_w), 1.0
    dx, dy = concentric_sample_disk(u[0], u[1])
    uwi = lt.o + dx * lt.p1 + dy * lt.p2 - p
    wi = _norm(uwi)
    dist2 = np.dot(uwi, uwi)
    cos_t = -np.dot(lt.normal, wi)
    if cos_t <= 0:
        return np.zeros(3), uwi, 1.0  # li black
    pdf = dist2 / (cos_t * lt.area)
    return lt.intensity.copy(), uwi, pdf


def concentric_sample_disk(u1, u2):
    sx, sy = 2 * u1 - 1, 2 * u2 - 1
    if sx == 0 and sy == 0:
        return 0.0, 0.0
    if sx >= -sy:
        if sx > sy:
            r, theta = sx, (sy / sx if sy > 0 else 8.0 + sy / sx)
        else:
            r, theta = sy, 2.0 - sx / sy
    else:
        if sx <= sy:
            r, theta = -sx, 4.0 - sy / -sx
        else:
            r, theta = -sy, 6.0 + sx / -sy
    theta *= math.pi / 4
    return r * math.cos(theta), r * math.sin(theta)


def specular_bounce(mat: OMaterial, hit, wo):
    """Mirror/glass direction at a hit (matches shading/material.specular:
    frame from (ns, dpdu), TIR reflects)."""
    nn = hit["ns"]
    sn = _norm(hit["dpdu"])
    tn = np.cross(nn, sn)
    lo = np.array([np.dot(wo, sn), np.dot(wo, tn), np.dot(wo, nn)])
    if mat.mtype == 1:
        wi = np.array([-lo[0], -lo[1], lo[2]])
        thr = mat.kd.copy()
    else:
        cos_o = lo[2]
        eta = (1.0 / mat.eta) if cos_o > 0 else mat.eta
        sint2 = eta * eta * max(0.0, 1.0 - cos_o * cos_o)
        if sint2 >= 1.0:
            wi = np.array([-lo[0], -lo[1], lo[2]])
        else:
            cost = math.sqrt(max(0.0, 1.0 - sint2))
            if cos_o > 0:
                cost = -cost
            wi = np.array([eta * -lo[0], eta * -lo[1], cost])
        thr = np.ones(3)
    wi_w = sn * wi[0] + tn * wi[1] + nn * wi[2]
    return thr, wi_w


def render_direct(scene: OScene, cam_to_world, fov_deg, width, height,
                  scene_eps=0.1, shadow_eps=1e-3, max_spec_depth=10,
                  include_emitted=False, area_samples=None):
    """Direct-lighting render at pixel centers (the simple-renderer oracle)."""
    img = np.zeros((height, width, 3))
    for py in range(height):
        for px in range(width):
            o, d = camera_ray(cam_to_world, fov_deg, width, height,
                              px + 0.5, py + 0.5)
            atten = np.ones(3)
            L = np.zeros(3)
            for depth in range(max_spec_depth + 1):
                hit = intersect_one(scene, o, d, scene_eps, 1e30)
                if hit is None:
                    break
                mat = scene.materials[hit["mat"]]
                if mat.mtype == 0:
                    L = atten * direct_light_at(
                        scene, hit, _norm(-d), shadow_eps,
                        area_samples=area_samples,
                        include_emitted=include_emitted)
                    break
                thr, wi = specular_bounce(mat, hit, _norm(-d))
                atten = atten * thr
                o, d = hit["p"], wi
            img[py, px] = L
    return img


# ---------------------------------------------------------------------------
# Photon transport (the GI oracle)
# ---------------------------------------------------------------------------

def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = math.sqrt(max(0.0, 1.0 - z * z))
    phi = 2.0 * math.pi * u2
    return np.array([r * math.cos(phi), r * math.sin(phi), z])


def cosine_sample_hemisphere_frame(u1, u2, nn, tangent):
    """Cosine-weighted direction around nn using Malley's method, in the
    (nn, tangent) frame."""
    dx, dy = concentric_sample_disk(u1, u2)
    dz = math.sqrt(max(0.0, 1.0 - dx * dx - dy * dy))
    sn = _norm(tangent)
    tn = np.cross(nn, sn)
    return sn * dx + tn * dy + nn * dz


def trace_photons_oracle(scene: OScene, n_paths: int, max_depth: int = 4,
                         max_bounces: int = 10, scene_eps: float = 1e-3,
                         seed: int = 0, russian_roulette: bool = False):
    """Brute-force photon tracing, one Python loop per path — deliberately a
    different code path from the JAX wavefront walk (renderers/photon.py).

    Same estimator semantics as the reference walk (photontracing.cu:80-185):
    emission-sampled start, specular bounces multiply throughput, diffuse
    hits deposit INDIRECT-only photons (after ≥1 interaction), cosine-
    hemisphere continuation with alpha *= f·|wi·n|/pdf. Lights are striped
    over paths with Le scaled by n_lights (renderers/photon.trace_photons).

    russian_roulette enables the pbrt-style per-bounce roulette the
    framework runs by default (P = min(1, y(α')/y(α)), survivors reweighted
    by 1/P) — the behavior the reference has written but commented out
    (photontracing.cu:173-178). Off matches the differentiable path.

    Returns (positions [P,3], alphas [P,3], incident dirs [P,3]).
    """
    y_w = np.array([0.212671, 0.715160, 0.072169])  # pbrt RGBSpectrum::y()
    rng = np.random.default_rng(seed)
    n_lights = len(scene.lights)
    ps, alphas, wis = [], [], []
    for path in range(n_paths):
        lt = scene.lights[path % n_lights]
        u = rng.random(4)
        if lt.ltype == 0:  # point: uniform sphere, pdf 1/4π
            o = lt.o.copy()
            d = uniform_sample_sphere(u[0], u[1])
            ns_l = d
            alpha = lt.intensity * (4.0 * math.pi)
        elif lt.ltype == 2:  # distant: world-disk origin, pdf 1/(π r²)
            dx, dy = concentric_sample_disk(u[0], u[1])
            r_w = math.sqrt(max(lt.area, 1e-20) / math.pi)
            o = lt.o - r_w * lt.normal + dx * lt.p1 + dy * lt.p2
            d = lt.normal.copy()
            ns_l = lt.normal
            alpha = lt.intensity * lt.area  # |N·d| = 1, Le/pdf = L·π r²
        else:  # area disk: disk origin, hemisphere dir, pdf 1/2π, Le = I·A
            dx, dy = concentric_sample_disk(u[0], u[1])
            o = lt.o + dx * lt.p1 + dy * lt.p2
            d = uniform_sample_sphere(u[2], u[3])
            if np.dot(d, lt.normal) < 0.0:
                d = -d
            ns_l = lt.normal
            alpha = abs(np.dot(ns_l, d)) * lt.intensity * lt.area * 2.0 * math.pi
        alpha = alpha * n_lights  # 1 / (uniform light-pick pmf)

        n_int = 0
        for _ in range(max_bounces):
            hit = intersect_one(scene, o, d, scene_eps, 1e30)
            if hit is None:
                break
            mat = scene.materials[hit["mat"]]
            if mat.mtype != 0:  # specular: multiply and continue
                thr, wi = specular_bounce(mat, hit, _norm(-d))
                alpha = alpha * thr
                if n_int == 0:  # photontracing.cu:126-129
                    n_int = 1
                o, d = hit["p"], wi
                if np.all(alpha == 0.0):
                    break
                continue
            if n_int >= 1:  # indirect-only deposit (photontracing.cu:141-151)
                ps.append(hit["p"])
                alphas.append(alpha.copy())
                wis.append(-_norm(d))
            if n_int >= max_depth:
                break
            u1, u2 = rng.random(2)
            wi = cosine_sample_hemisphere_frame(u1, u2, hit["ns"], hit["dpdu"])
            # f·|wi·n|/pdf = (kd/π)·cosθ/(cosθ/π) = kd for Lambert
            anew = alpha * mat_kd(mat, hit.get("uv"))
            if russian_roulette:
                # P = min(1, y(α')/y(α)), survivors reweighted by 1/P
                # (renderers/photon._photon_step; photontracing.cu:173-178)
                y_old = float(np.dot(alpha, y_w))
                y_new = float(np.dot(anew, y_w))
                p_cont = min(1.0, y_new / y_old) if y_old > 0.0 else 0.0
                if p_cont <= 0.0 or rng.random() > p_cont:
                    break
                anew = anew / p_cont
            alpha = anew
            o, d = hit["p"], wi
            n_int += 1
    if not ps:
        return np.zeros((0, 3)), np.zeros((0, 3)), np.zeros((0, 3))
    return np.stack(ps), np.stack(alphas), np.stack(wis)


def gather_photons_oracle(pp, pal, pwi, q, radius2, ns, kd):
    """Brute-force radius search + Lambert shading at one query point
    (the reference kd-tree gather's semantics, gathering.cu:17-96):
    returns (Σ |ns·wi|·(kd/π)·α over dist² < r², match count)."""
    if len(pp) == 0:
        return np.zeros(3), 0
    d2 = ((pp - q) ** 2).sum(axis=-1)
    sel = d2 < radius2
    if not sel.any():
        return np.zeros(3), 0
    w = np.abs(pwi[sel] @ ns)
    return (w[:, None] * (kd / math.pi) * pal[sel]).sum(axis=0), int(sel.sum())


def render_photon_oracle(scene: OScene, cam_to_world, fov_deg, width, height,
                         n_paths: int, radius2: float = 1.0,
                         max_depth: int = 4, scene_eps: float = 1e-3,
                         shadow_eps: float = 1e-3, max_spec_depth: int = 10,
                         area_samples=None, seed: int = 0,
                         indirect_only: bool = False,
                         russian_roulette: bool = False):
    """Full photon-mapping render at pixel centers: direct lighting plus a
    single-pass density estimate L_ind = gathered/(π·r²·N_emitted). A single
    PPM pass's α-factors cancel (flux and radius² both scale by α,
    gathering.cu:116-122 with N=0), so this IS the one-pass progressive
    estimate the framework computes."""
    pp, pal, pwi = trace_photons_oracle(
        scene, n_paths, max_depth=max_depth, scene_eps=scene_eps, seed=seed,
        russian_roulette=russian_roulette)
    img = np.zeros((height, width, 3))
    inv_norm = 1.0 / (math.pi * radius2 * n_paths)
    for py in range(height):
        for px in range(width):
            o, d = camera_ray(cam_to_world, fov_deg, width, height,
                              px + 0.5, py + 0.5)
            atten = np.ones(3)
            L = np.zeros(3)
            for depth in range(max_spec_depth + 1):
                hit = intersect_one(scene, o, d, scene_eps, 1e30)
                if hit is None:
                    break
                mat = scene.materials[hit["mat"]]
                if mat.mtype == 0:
                    direct = np.zeros(3)
                    if not indirect_only:
                        direct = direct_light_at(
                            scene, hit, _norm(-d), shadow_eps,
                            area_samples=area_samples, include_emitted=True)
                    gathered, _ = gather_photons_oracle(
                        pp, pal, pwi, hit["p"], radius2,
                        hit["ns"], mat_kd(mat, hit.get("uv")))
                    L = atten * (direct + gathered * inv_norm)
                    break
                thr, wi = specular_bounce(mat, hit, _norm(-d))
                atten = atten * thr
                o, d = hit["p"], wi
            img[py, px] = L
    return img
