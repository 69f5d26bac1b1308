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


# ---------------------------------------------------------------------------
# full-scene oracle: instances, all 8 modes, lights, reflection, cubemap
# (scalar re-derivation of SH/Raytracing*.hlsl closest-hit/miss + TLAS)
# ---------------------------------------------------------------------------

def _quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


class InstanceNP:
    """One TLAS entry: volume + TRS + material (reference geometry CB)."""

    def __init__(self, volume, position=(0, 0, 0), scale=(1, 1, 1),
                 rotation=(0, 0, 0, 1), tint=(1, 1, 1), roughness=0.8,
                 metallic=0.0, albedo_tex=None, normal_tex=None,
                 rm_tex=None, tex_scale=(100.0, 100.0)):
        self.volume = volume
        self.position = np.asarray(position, np.float64)
        self.scale = np.asarray(scale, np.float64)
        self.rotation = np.asarray(rotation, np.float64)
        self.tint = np.asarray(tint, np.float64)
        self.roughness = float(roughness)
        self.metallic = float(metallic)
        self.k = (self.roughness + 1.0) ** 2 / 8.0  # RDXVoxelVolume.cpp:383
        self.albedo_tex = albedo_tex    # [H,W,3] float or None (-> white)
        self.normal_tex = normal_tex    # None -> flat (0.5,0.5,1)
        self.rm_tex = rm_tex            # None -> white
        self.tex_scale = np.asarray(tex_scale, np.float64)

    def world_to_object(self, o, d):
        qi = _quat_conj(self.rotation)
        return (_quat_rotate(qi, (o - self.position) / self.scale),
                _quat_rotate(qi, d / self.scale))

    def object_pos(self, world_pos):
        return _quat_rotate(_quat_conj(self.rotation),
                            (world_pos - self.position) / self.scale)

    def normal_to_world(self, n_obj):
        # mul(float4(n,0), ObjectToWorld4x3()): rotate then scale, no renorm
        return _quat_rotate(self.rotation, n_obj) * self.scale


class SceneNP:
    def __init__(self, instances, env, dir_light_dir=(0, 0, -1),
                 dir_light_strength=0.0, point_lights=(), spot_lights=()):
        self.instances = list(instances)
        self.env = np.asarray(env, np.float64)   # [6,E,E,3] cubemap
        self.dir_light_dir = np.asarray(dir_light_dir, np.float64)
        self.dir_light_strength = float(dir_light_strength)
        # point: dict(position, color, intensity, att_l, att_exp)
        self.point_lights = list(point_lights)
        # spot: dict(position, forward, color, intensity, att_l, att_exp,
        #            cos_angle, cos_falloff)
        self.spot_lights = list(spot_lights)


def sample_bilinear_wrap_np(tex, uv):
    """D3D linear+wrap sampler (texel centers at (i+.5)/N)."""
    h, w = tex.shape[0], tex.shape[1]
    u = uv[0] * w - 0.5
    v = uv[1] * h - 0.5
    u0, v0 = np.floor(u), np.floor(v)
    fu, fv = u - u0, v - v0
    out = np.zeros(3)
    for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                        (1, 0, fu * (1 - fv)),
                        (0, 1, (1 - fu) * fv), (1, 1, fu * fv)):
        ui = int(u0 + du) % w
        vi = int(v0 + dv) % h
        out += wgt * tex[vi, ui]
    return out


def tri_sample_np(tex, scale, obj_pos, n_obj):
    """TriSampleTexture (Textures.hlsli:16-34): uvX=zy, uvY=xz, uvZ=xy."""
    if tex is None:
        return np.ones(3)
    uvs = [np.array([obj_pos[2], obj_pos[1]]) / scale,
           np.array([obj_pos[0], obj_pos[2]]) / scale,
           np.array([obj_pos[0], obj_pos[1]]) / scale]
    taps = [sample_bilinear_wrap_np(tex, uv) for uv in uvs]
    b = np.abs(n_obj)
    s = b.sum()
    b = b / s if s > 0 else b * 0.0
    return taps[0] * b[0] + taps[1] * b[1] + taps[2] * b[2]


def _quat_from_x_np(v):
    """fromX (Quaternion.hlsli): rotation taking +X to v."""
    x = np.array([1.0, 0.0, 0.0])
    c = np.cross(x, v)
    w = 1.0 + np.dot(x, v)
    if w < 1e-6:  # antiparallel: 180 deg about any perpendicular (use Z)
        q = np.array([0.0, 0.0, 1.0, 0.0])
        return q
    q = np.array([c[0], c[1], c[2], w])
    return q / np.linalg.norm(q)


def tri_sample_normal_np(tex, scale, obj_pos, n_obj):
    """TriSampleNormal (Textures.hlsli:36-58): .zxy swizzle + fromX rotate."""
    if tex is None:
        t = np.array([0.0, 0.0, 1.0])  # flat tangent normal
    else:
        uvs = [np.array([obj_pos[2], obj_pos[1]]) / scale,
               np.array([obj_pos[0], obj_pos[2]]) / scale,
               np.array([obj_pos[0], obj_pos[1]]) / scale]
        taps = [sample_bilinear_wrap_np(tex, uv) * 2.0 - 1.0 for uv in uvs]
        b = np.abs(n_obj)
        s = b.sum()
        b = b / s if s > 0 else b * 0.0
        t = taps[0] * b[0] + taps[1] * b[1] + taps[2] * b[2]
        nt = np.linalg.norm(t)
        t = t / nt if nt > 0 else t * 0.0
    t = np.array([t[2], t[0], t[1]])  # .zxy
    q = _quat_from_x_np(np.asarray(n_obj, np.float64))
    return _quat_rotate(q, t)


def sample_cube_np(env, direction):
    """D3D cube lookup + bilinear (face order +X,-X,+Y,-Y,+Z,-Z)."""
    x, y, z = direction
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        ma, face = ax, (0 if x >= 0 else 1)
        sc, tc = (-z, -y) if x >= 0 else (z, -y)
    elif ay >= az:
        ma, face = ay, (2 if y >= 0 else 3)
        sc, tc = (x, z) if y >= 0 else (x, -z)
    else:
        ma, face = az, (4 if z >= 0 else 5)
        sc, tc = (x, -y) if z >= 0 else (-x, -y)
    e = env.shape[1]
    u = (sc / ma + 1.0) * 0.5 * e - 0.5
    v = (tc / ma + 1.0) * 0.5 * e - 0.5
    u0, v0 = np.floor(u), np.floor(v)
    fu, fv = u - u0, v - v0
    out = np.zeros(3)
    for du, dv, wgt in ((0, 0, (1 - fu) * (1 - fv)),
                        (1, 0, fu * (1 - fv)),
                        (0, 1, (1 - fu) * fv), (1, 1, fu * fv)):
        ui = min(max(int(u0 + du), 0), e - 1)
        vi = min(max(int(v0 + dv), 0), e - 1)
        out += wgt * env[face, vi, ui]
    return out


def sample_env_np(env, d):
    """VRMiss: cubemap sampled with the direction swizzled .xzy."""
    return sample_cube_np(env, np.array([d[0], d[2], d[1]]))


def trace_scene_np(scene, o, d, t_max, interp):
    """Closest hit across instances (the TLAS).  Returns
    (inst_idx, hitdict) or (None, None)."""
    best = None
    best_i = None
    best_t = np.inf
    for i, inst in enumerate(scene.instances):
        oo, dd = inst.world_to_object(np.asarray(o, np.float64),
                                      np.asarray(d, np.float64))
        fn = intersect_volume if interp else intersect_volume_cube
        h = fn(inst.volume, oo, dd, t_max=min(t_max, best_t))
        if h is not None and h["t"] < best_t:
            best, best_i, best_t = h, i, h["t"]
    return best_i, best


def trace_shadow_np(scene, o, d, max_dist, depth, interp):
    """TraceShadowRay: recursion-capped boolean any-hit."""
    if depth >= 3:
        return False
    i, h = trace_scene_np(scene, o, d, max_dist, interp)
    return h is not None


def trace_radiance_np(scene, o, d, depth, interp=True, lit=True,
                      textured=True, shadow_backoff=0.1):
    """TraceRadianceRay + VRClosestHit/VRMiss (depth 0-based like vrt:
    reference payload depth minus 1)."""
    if depth >= 3:
        return np.zeros(3)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    ii, h = trace_scene_np(scene, o, d, 10000.0, interp)
    if h is None:
        return sample_env_np(scene.env, d)
    if h["kind"] == "exhausted":
        return np.array([1.0, 0.0, 0.0])  # attr.unlit -> attr.normal (red)
    inst = scene.instances[ii]
    n_obj = h["normal"]
    t = h["t"]
    hit_pos = o + t * d
    shadow_origin = hit_pos - d * shadow_backoff
    obj_pos = inst.object_pos(hit_pos)

    if not lit:
        if textured:
            return inst.tint * tri_sample_np(inst.albedo_tex, inst.tex_scale,
                                             obj_pos, n_obj)
        return inst.tint.copy()

    if textured:
        albedo = inst.tint * tri_sample_np(inst.albedo_tex, inst.tex_scale,
                                           obj_pos, n_obj)
        rm = tri_sample_np(inst.rm_tex, inst.tex_scale, obj_pos, n_obj)
        roughness = min(max(inst.roughness * rm[0], 0.0), 1.0)
        metallic = min(max(inst.metallic * rm[1], 0.0), 1.0)
        n_shade = tri_sample_normal_np(inst.normal_tex, inst.tex_scale,
                                       obj_pos, n_obj)
    else:
        albedo = inst.tint.copy()
        roughness = min(max(inst.roughness, 0.0), 1.0)
        metallic = min(max(inst.metallic, 0.0), 1.0)
        n_shade = n_obj
    k = inst.k
    n_w = inst.normal_to_world(n_shade)
    wo = -d

    diffuse = np.zeros(3)  # SHADOW_BRIGHTNESS = 0

    # mirror reflection (Raytracing.hlsl:79-91)
    if roughness < 0.3 and depth + 1 < 3:
        refl = d - 2.0 * np.dot(d, n_w) * n_w
        refl = refl / np.linalg.norm(refl)
        rc = trace_radiance_np(scene, shadow_origin, refl, depth + 1,
                               interp, lit, textured, shadow_backoff)
        rc = np.maximum(0.0, rc * (1.0 - roughness * 2.2))
        diffuse = diffuse + cook_torrance(rc, refl, wo, n_w, albedo,
                                          roughness, metallic, k)

    # directional light (Raytracing.hlsl:93-98)
    sh = trace_shadow_np(scene, shadow_origin, scene.dir_light_dir, 5000.0,
                         depth + 1, interp)
    if not sh:
        li = np.full(3, scene.dir_light_strength)
        diffuse = diffuse + cook_torrance(li, scene.dir_light_dir, wo, n_w,
                                          albedo, roughness, metallic, k)

    # point lights (Raytracing.hlsl:100-120)
    for L in scene.point_lights:
        delta = np.asarray(L["position"], np.float64) - shadow_origin
        dist = np.linalg.norm(delta)
        inten = L["intensity"] / (1 + L["att_l"] * dist
                                  + L["att_exp"] * dist * dist)
        if inten > 0.005:
            sdir = delta / dist
            sh = trace_shadow_np(scene, shadow_origin, sdir, dist,
                                 depth + 1, interp)
            if not sh:
                li = np.asarray(L["color"], np.float64) * inten
                diffuse = diffuse + cook_torrance(li, sdir, wo, n_w, albedo,
                                                  roughness, metallic, k)

    # spot lights (Raytracing.hlsl:122-139; color indexed by the SPOT —
    # the reference's [pi] out-of-scope bug deliberately not reproduced)
    for L in scene.spot_lights:
        lp = np.asarray(L["position"], np.float64)
        delta = lp - shadow_origin
        dist = np.linalg.norm(delta)
        sdirn = (shadow_origin - lp) / dist
        cos_surf = np.dot(np.asarray(L["forward"], np.float64), sdirn)
        inten = 0.0
        if cos_surf >= 0.0 and cos_surf > L["cos_angle"]:
            fall = min((cos_surf - L["cos_angle"])
                       / (L["cos_falloff"] - L["cos_angle"]), 1.0)
            inten = (L["intensity"] * fall
                     / (1 + L["att_l"] * dist + L["att_exp"] * dist * dist))
        if inten > 0.01:
            sdir = delta / dist
            sh = trace_shadow_np(scene, shadow_origin, sdir, dist,
                                 depth + 1, interp)
            if not sh:
                li = np.asarray(L["color"], np.float64) * inten
                diffuse = diffuse + cook_torrance(li, sdir, wo, n_w, albedo,
                                                  roughness, metallic, k)
    return diffuse


def render_scene_np(scene, width, height, cam_pos, cam_rot, fov,
                    interp=True, lit=True, textured=True,
                    shadow_backoff=0.1):
    """Full-pipeline scalar render: raygen -> radiance -> Reinhard+gamma
    tonemap with UNORM flush.  [H,W,3] float32."""
    img = np.zeros((height, width, 3), np.float32)
    for py in range(height):
        for px in range(width):
            o, d = camera_ray(px, py, width, height, cam_pos, cam_rot, fov)
            rgb = trace_radiance_np(scene, o, d, 0, interp, lit,
                                    textured, shadow_backoff)
            c = rgb / (rgb + 1.0)
            with np.errstate(all="ignore"):
                c = np.power(c, 1 / 2.2)
            img[py, px] = np.clip(np.nan_to_num(c, nan=0.0), 0.0, 1.0)
    return img
