"""Independent scalar NumPy re-derivation of the reference algorithm.

This is the golden model for the JAX implementation: a direct, slow,
ray-at-a-time transcription of the DXR shader semantics
(``SH/Raytracing.hlsl`` + ``SH/Include/*.hlsli``), written against the
*reference's* documented behavior — not against vrt code — so the two
implementations are developed independently and cross-checked.
"""

from __future__ import annotations

import numpy as np

INF = np.float32(np.inf)


# ---------------------------------------------------------------------------
# grid helpers
# ---------------------------------------------------------------------------

def build_octree_levels(sdf, resolution):
    """Collapsed-octree skip level per cell, computed bottom-up like
    VCellOctree::CollapseTree."""
    n = sdf.shape[0]
    c = n - 1
    s = np.sign(sdf)
    has = np.zeros((c, c, c), bool)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                if dx == dy == dz == 0:
                    continue
                has |= s[dx:dx + c, dy:dy + c, dz:dz + c] != s[:c, :c, :c]
    level = np.zeros((c, c, c), np.int32)
    block = has.astype(np.int32)
    for lvl in range(1, resolution + 1):
        side = c >> lvl
        if side < 1:
            break
        block = block.reshape(side, 2, side, 2, side, 2).max(axis=(1, 3, 5))
        free = block == 0
        up = np.repeat(np.repeat(np.repeat(free, 1 << lvl, 0), 1 << lvl, 1),
                       1 << lvl, 2)
        level[up] = lvl
    return level


class Volume:
    def __init__(self, sdf, resolution, extends):
        self.sdf = np.asarray(sdf, np.float32)
        self.resolution = resolution
        self.extends = float(extends)
        self.n = (1 << resolution) + 1
        self.h = 2.0 * extends / (self.n - 1)
        self.levels = build_octree_levels(self.sdf, resolution)

    def density(self, idx):
        x, y, z = idx
        if 0 <= x < self.n and 0 <= y < self.n and 0 <= z < self.n:
            return float(self.sdf[x, y, z])
        return 0.0  # D3D OOB typed read

    def is_valid_cell(self, c):
        return all(0 <= c[i] and c[i] + 1 < self.n for i in range(3))

    def is_valid_voxel(self, c):
        return all(0 <= c[i] < self.n for i in range(3))

    def pos_to_cell(self, p):
        return np.floor((np.asarray(p) + self.extends) / self.h).astype(int)

    def voxel_pos(self, idx):
        return np.asarray(idx, np.float64) * self.h - self.extends

    def get_node(self, cell):
        """GetOctreeNode: node pos/size of the collapsed leaf, or the
        degenerate (pos -1, size 0) node for invalid cells."""
        if not self.is_valid_cell(cell):
            return np.array([-1.0, -1.0, -1.0]), 0.0
        lvl = int(self.levels[tuple(np.asarray(cell))])
        origin = (np.asarray(cell) >> lvl) << lvl
        return self.voxel_pos(origin), self.h * (1 << lvl)

    def corners(self, cell):
        out = np.empty(8, np.float32)
        k = 0
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    pass
        order = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                 (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
        for i, off in enumerate(order):
            out[i] = self.density((cell[0] + off[0], cell[1] + off[1],
                                   cell[2] + off[2]))
        return out


# ---------------------------------------------------------------------------
# ray helpers (Ray.hlsli)
# ---------------------------------------------------------------------------

def inv_dir(d):
    out = np.empty(3)
    for i in range(3):
        out[i] = 1.0 / d[i] if d[i] != 0 else -INF
    return out


def ray_aabb(o, d, lo, hi, t_max):
    inv = inv_dir(d)
    tmin = np.empty(3)
    tmax = np.empty(3)
    for i in range(3):
        if d[i] > 0:
            tmin[i] = (lo[i] - o[i]) * inv[i]
            tmax[i] = (hi[i] - o[i]) * inv[i]
        else:
            tmin[i] = (hi[i] - o[i]) * inv[i]
            tmax[i] = (lo[i] - o[i]) * inv[i]
    t_enter = tmin.max()
    t_exit = tmax.min()
    return (t_exit > t_enter and t_exit >= 0 and t_enter <= t_max,
            t_enter, t_exit)


def node_exit(o, d, node_pos, size):
    """GoToNextVoxel nested-min with reference tie-breaking; returns
    (exit_t, axis)."""
    tm = np.full(3, 1e5)
    for i in range(3):
        if d[i] != 0:
            plane = node_pos[i] + size if d[i] > 0 else node_pos[i]
            tm[i] = (plane - o[i]) / d[i]
    if tm[0] < tm[1]:
        return (tm[0], 0) if tm[0] < tm[2] else (tm[2], 2)
    return (tm[1], 1) if tm[1] < tm[2] else (tm[2], 2)


# ---------------------------------------------------------------------------
# cubic isosurface (Voxel.hlsli)
# ---------------------------------------------------------------------------

def cell_space(vol, cell, size, p):
    return (np.asarray(p) - vol.voxel_pos(cell)) / size


def density_polynomial(vol, cell, size, o, d, t_in, t_out):
    a1 = cell_space(vol, cell, size, o + d * t_in)
    a0 = 1.0 - a1
    b1 = cell_space(vol, cell, size, o + d * t_out) - a1
    b0 = -b1
    v = vol.corners(cell)
    order = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
             (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    A = B = C = D = 0.0
    for i, (ix, iy, iz) in enumerate(order):
        ax = a1 if ix else a0
        ay = a1 if iy else a0
        az = a1 if iz else a0
        bx = b1 if ix else b0
        by = b1 if iy else b0
        bz = b1 if iz else b0
        A += bx[0] * by[1] * bz[2] * v[i]
        D += ax[0] * ay[1] * az[2] * v[i]
        B += (ax[0] * by[1] * bz[2] + bx[0] * ay[1] * bz[2]
              + bx[0] * by[1] * az[2]) * v[i]
        C += (bx[0] * ay[1] * az[2] + ax[0] * by[1] * az[2]
              + ax[0] * ay[1] * bz[2]) * v[i]
    return A, B, C, D


def poly(t, A, B, C, D):
    return ((A * t + B) * t + C) * t + D


def surface_intersection_t(vol, cell, size, o, d, t_in, t_out):
    A, B, C, D = density_polynomial(vol, cell, size, o, d, t_in, t_out)
    t0 = max(0.0, -t_in / (t_out - t_in))
    t1 = 1.0
    f0 = poly(t0, A, B, C, D)
    if np.sign(f0) <= 0:
        return True, t_in
    f1 = poly(t1, A, B, C, D)
    dA, dB = 3 * A, 2 * B
    with np.errstate(all="ignore"):
        disc = dB * dB - 4 * dA * C
        if disc >= 0 and dA != 0:
            sq = np.sqrt(disc)
            ex1 = (-dB + sq) / (2 * dA)
            ex2 = (-dB - sq) / (2 * dA)
        else:
            ex1 = ex2 = np.inf
    if ex1 > ex2:
        ex1, ex2 = ex2, ex1
    for ex in (ex1, ex2):
        if t0 <= ex <= t1:
            fe = poly(ex, A, B, C, D)
            if np.sign(fe) == np.sign(f0):
                t0, f0 = ex, fe
            else:
                t1, f1 = ex, fe
    if np.sign(f0) == np.sign(f1):
        return False, 0.0
    for _ in range(2):
        t = t0 + (t1 - t0) * (-f0 / (f1 - f0))
        f = poly(t, A, B, C, D)
        if np.sign(f) == np.sign(f0):
            t0, f0 = t, f
        else:
            t1, f1 = t, f
    t = t0 + (t1 - t0) * (-f0 / (f1 - f0))
    t_hit = t_in + (t_out - t_in) * t
    return t_hit > 0, t_hit


def trilinear(vol, cell, p):
    v = vol.corners(cell)
    order = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
             (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    total = 0.0
    for i, (ix, iy, iz) in enumerate(order):
        u = abs((1 - ix) - p[0])
        vv = abs((1 - iy) - p[1])
        w = abs((1 - iz) - p[2])
        total += u * vv * w * v[i]
    return total


def normal_at(vol, cell, p):
    g = np.array([
        trilinear(vol, (cell[0] + 1, cell[1], cell[2]), p)
        - trilinear(vol, (cell[0] - 1, cell[1], cell[2]), p),
        trilinear(vol, (cell[0], cell[1] + 1, cell[2]), p)
        - trilinear(vol, (cell[0], cell[1] - 1, cell[2]), p),
        trilinear(vol, (cell[0], cell[1], cell[2] + 1), p)
        - trilinear(vol, (cell[0], cell[1], cell[2] - 1), p)])
    with np.errstate(all="ignore"):
        out = g / np.linalg.norm(g)
    if not np.all(np.isfinite(out)):
        return np.zeros(3)
    return out


# ---------------------------------------------------------------------------
# the intersection shader (VRIntersection)
# ---------------------------------------------------------------------------

def entry_face_normal(o, d, t, ext):
    rp = o + d * (t - 0.1)
    n = np.sign(rp - ext)
    for i in range(3):
        if n[i] < 0:
            n[i] = -1.0 if rp[i] < -ext else 0.0
    with np.errstate(all="ignore"):
        return n / np.linalg.norm(n)


def intersect_volume(vol, o, d, t_max=10000.0):
    """Returns dict(kind, t, cell, normal) or None.  kind in
    {'surface','solid','exhausted'}."""
    ext = vol.extends
    ok, t_enter, t_exit = ray_aabb(o, d, np.full(3, -ext), np.full(3, ext),
                                   t_max)
    if not ok:
        return None
    if t_enter >= 0:
        t_enter = t_enter + 0.01
        cell = vol.pos_to_cell(o + d * t_enter)
        cell_exit = t_enter
    else:
        cell = vol.pos_to_cell(o)
        node_pos, size = vol.get_node(cell)
        fwd_exit, _ = node_exit(o, d, node_pos, size)  # ReverseRay no-op bug
        cell_exit = -fwd_exit + 0.01

    if vol.is_valid_cell(cell) and np.all(vol.corners(cell) < 0):
        if 0 <= t_enter <= t_max:
            return dict(kind="solid", t=t_enter, cell=tuple(cell),
                        normal=entry_face_normal(o, d, t_enter, ext))
        return None

    for _ in range(255):
        if cell_exit > t_exit:
            return None
        cell_enter = cell_exit
        if not vol.is_valid_cell(cell):
            return None
        node_pos, size = vol.get_node(cell)
        ex, _ = node_exit(o, d, node_pos, size)
        cell_exit = ex + 0.1
        next_cell = vol.pos_to_cell(o + d * cell_exit)
        v = vol.corners(cell)
        s = np.sign(v)
        if np.any(s[1:] != s[0]):
            hit, t_hit = surface_intersection_t(vol, cell, size, o, d,
                                                cell_enter, cell_exit)
            if hit:
                if 0 <= t_hit <= t_max:
                    p = cell_space(vol, cell, size, o + d * t_hit)
                    return dict(kind="surface", t=t_hit, cell=tuple(cell),
                                normal=normal_at(vol, cell, p))
                return None
        cell = next_cell
    if 10.0 <= t_max:
        return dict(kind="exhausted", t=10.0, cell=None,
                    normal=np.array([1.0, 0.0, 0.0]))
    return None


# ---------------------------------------------------------------------------
# full-pipeline shading (VRClosestHit NoTex-lit subset + raygen/tonemap)
# ---------------------------------------------------------------------------

REF_PI = 3.141592
F0_DIEL = 0.04


def _quat_rotate(q, v):
    qv = np.asarray(q[:3])
    qw = q[3]
    t = 2.0 * np.cross(qv, v)
    return v + qw * t + np.cross(qv, t)


def camera_ray(px, py, w, h, cam_pos, cam_rot, fov_deg):
    """GenerateCameraRay composed with LookToRH/PerspectiveFovRH."""
    aspect = w / h
    y_scale = 1.0 / np.tan(np.deg2rad(fov_deg) / 2)
    x_scale = y_scale / aspect
    fwd = _quat_rotate(cam_rot, np.array([1.0, 0, 0]))
    up = _quat_rotate(cam_rot, np.array([0.0, 0, 1.0]))
    zaxis = -fwd / np.linalg.norm(fwd)
    xaxis = np.cross(up, zaxis)
    xaxis /= np.linalg.norm(xaxis)
    yaxis = np.cross(zaxis, xaxis)
    sx = (px + 0.5) / w * 2 - 1
    sy = (py + 0.5) / h * 2 - 1
    d = (sx / x_scale) * xaxis - (sy / y_scale) * yaxis - zaxis
    return np.asarray(cam_pos, np.float64), d


def cook_torrance(li, wi, wo, n, albedo, roughness, metallic, k):
    h = wi + wo
    h = h / np.linalg.norm(h)
    a2 = roughness * roughness
    ndoth = max(np.dot(n, h), 0.0)
    c = ndoth * ndoth * (a2 - 1) + 1
    d = a2 / max(REF_PI * c * c, 0.001)
    f0 = F0_DIEL * (1 - metallic) + np.asarray(albedo) * metallic
    wdoth = max(np.dot(wo, h), 0.0)
    f = f0 + (1 - f0) * max(1 - wdoth, 0.0) ** 5
    def gs(x):
        return x / (x * (1 - k) + k)
    g = gs(max(np.dot(n, wo), 0.0)) * gs(max(np.dot(n, wi), 0.0))
    lambert = np.asarray(albedo) / REF_PI
    denom = max(4 * max(np.dot(wo, n), 0.0) * max(np.dot(wi, n), 0.0), 1e-4)
    cook = d * g / denom * f
    kd = (1 - f) * (1 - metallic)
    return (lambert * kd + cook * f) * np.asarray(li) * np.dot(n, wi)


def render_notex_lit(vol, width, height, cam_pos, cam_rot, fov,
                     light_dir, light_strength, albedo, roughness,
                     metallic, env_color):
    """Scalar re-derivation of the NoTex-lit pipeline for one volume at the
    origin: primary march, dir-light shadow march, Cook-Torrance, Reinhard
    tonemap with UNORM clamp.  Materials with roughness >= 0.3 only (no
    reflection bounce)."""
    k = (roughness + 1) ** 2 / 8
    img = np.zeros((height, width, 3), np.float32)
    for py in range(height):
        for px in range(width):
            o, d = camera_ray(px, py, width, height, cam_pos, cam_rot, fov)
            hit = intersect_volume(vol, o, d)
            if hit is None:
                rgb = np.asarray(env_color, np.float64)
            elif hit["kind"] == "exhausted":
                rgb = np.array([1.0, 0, 0])
            else:
                hp = o + hit["t"] * d
                so = hp - d * 0.1
                sh = intersect_volume(vol, so, np.asarray(light_dir,
                                                          np.float64),
                                      t_max=5000.0)
                rgb = np.zeros(3)
                n = hit["normal"]
                if sh is None:
                    li = np.full(3, light_strength)
                    rgb = rgb + cook_torrance(li, np.asarray(light_dir),
                                              -d, n, albedo, roughness,
                                              metallic, k)
            c = rgb / (rgb + 1.0)
            with np.errstate(all="ignore"):
                c = np.power(c, 1 / 2.2)
            c = np.clip(np.nan_to_num(c, nan=0.0), 0.0, 1.0)
            img[py, px] = c
    return img


def intersect_volume_cube(vol, o, d, t_max=10000.0):
    """Cube-mode intersection (SH/Raytracing_Cube.hlsl): voxel-level DDA;
    hit when entering a voxel with density <= 0; normal = face normal of
    the last crossing (seeded with the volume-entry face normal)."""
    ext = vol.extends
    ok, t_enter, t_exit = ray_aabb(o, d, np.full(3, -ext), np.full(3, ext),
                                   t_max)
    if not ok:
        return None
    if t_enter >= 0:
        t_enter = t_enter + 0.01
        cell = vol.pos_to_cell(o + d * t_enter)
        cell_exit = t_enter
    else:
        cell = vol.pos_to_cell(o)
        node_pos, size = vol.get_node(cell)
        fwd_exit, _ = node_exit(o, d, node_pos, size)
        cell_exit = -fwd_exit + 0.01

    normal = entry_face_normal(o, d, t_enter, ext)

    axes = np.eye(3)
    for _ in range(255):
        if cell_exit > t_exit:
            return None
        cell_enter = cell_exit
        if not vol.is_valid_voxel(cell):
            return None
        node_pos, size = vol.get_node(cell)
        ex, axis = node_exit(o, d, node_pos, size)
        cell_exit = ex + 0.1
        if vol.density(tuple(cell)) <= 0.0:
            if 0 <= cell_enter <= t_max:
                return dict(kind="cube", t=cell_enter, cell=tuple(cell),
                            normal=normal)
            return None
        next_cell = vol.pos_to_cell(o + d * cell_exit)
        normal = -np.sign(d[axis]) * axes[axis]
        cell = next_cell
    if 10.0 <= t_max:
        return dict(kind="exhausted", t=10.0, cell=None,
                    normal=np.array([1.0, 0, 0]))
    return None
