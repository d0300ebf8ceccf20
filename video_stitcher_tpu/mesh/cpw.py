"""Content-preserving-warp (CPW) mesh least squares.

Re-implements MeshWarper's energy (360_stitcher/meshwarper.cpp:48-786),
after Liu et al. CVPR'14, over the unknown vector of 2*M*N*num_cams mesh
vertex coordinates:

* local alignment (meshwarper.cpp:596-709): for every matched feature pair
  between ring neighbors, the bilinearly-interpolated x positions must
  differ by the inter-camera panorama offset (y difference -> 0);
* global alignment (meshwarper.cpp:389-418): vertices farther than
  GLOBAL_DIST from every feature are anchored to their rest position;
* smoothness (meshwarper.cpp:421-593): each of the 8 triangles around a
  vertex must deform by a similarity transform, weighted by local color
  variance salience.

Deviations (documented):
* The reference's target x-distance is theta*f*scale with hardcoded
  theta=4.25/-0.25 for cameras 3/4 (meshwarper.cpp:620-627) — artifacts of
  OpenCV's atan2 branch-cut split of the yaw=pi camera. Our uniform band
  layout has no split, so the target is the *exact* band corner difference.
* The reference accidentally sums the x and y smoothness residuals into one
  duplicated equation (meshwarper.cpp:568-587 inserts identical rows at
  row and row+1); we keep the standard separate x/y residuals
  V1 = V2 + u*(V3-V2) + v*R90(V3-V2).
* Solved with dense normal equations (1200 unknowns) instead of Eigen
  LeastSquaresConjugateGradient — same minimizer.

Host-side (runs at ~1 Hz in the recalibration job); NumPy + scipy.sparse.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
from scipy import sparse

# the 8 triangles around a vertex (offsets of V1, V3 relative to the vertex
# V2=(0,0)), in the reference's t=0..7 order (meshwarper.cpp:446-489)
_TRIANGLES = [
    ((-1, 0), (-1, -1)), ((0, -1), (-1, -1)),
    ((0, -1), (1, -1)), ((1, 0), (1, -1)),
    ((-1, 0), (-1, 1)), ((0, 1), (-1, 1)),
    ((0, 1), (1, 1)), ((1, 0), (1, 1)),
]


@dataclass
class CamMatches:
    """Selected matches of camera src against dst=(src-1) mod C (band coords)."""
    p1: np.ndarray          # [K, 2] points in src band
    p2: np.ndarray          # [K, 2] points in dst band
    dst: int


@dataclass
class TemporalMatches:
    """Matches of camera cam at frame t against the same camera at t-1
    (meshwarper.cpp calcTemporalLocalTerm inputs, matched by
    featurefinder::matchFeaturesTemporal)."""
    pt: np.ndarray          # [K, 2] points in current band
    pp: np.ndarray          # [K, 2] same points in the previous frame's band


class CPWSolver:
    def __init__(self, num_images: int, mesh_w: int, mesh_h: int,
                 band_w: int, band_h: int, targets: Sequence[float],
                 alphas=(1.0, 0.01, 0.00005, 0.0), global_dist: float = 30.0,
                 recalib_thresh: float = 15.0, shrink_px: float = 0.75):
        self.C = num_images
        self.M = mesh_w
        self.N = mesh_h
        self.bw = band_w
        self.bh = band_h
        self.targets = list(targets)    # per-src-camera x target vs dst cam
        self.alphas = alphas
        self.global_dist = global_dist
        self.recalib_thresh = recalib_thresh
        self.shrink_px = shrink_px
        # feature-stability state (meshwarper.cpp:208-276)
        self.prev_avg = np.zeros(num_images * 2)
        self.old_matches: List[Optional[CamMatches]] = [None] * num_images
        # previous solved mesh, for the temporal term (meshwarper.cpp:711-786)
        self.prev_verts: Optional[np.ndarray] = None

    # --- rest grid ---------------------------------------------------
    def rest_x(self, j):
        return np.asarray(j, np.float64) * (self.bw - 1) / (self.M - 1)

    def rest_y(self, i):
        return np.asarray(i, np.float64) * (self.bh - 1) / (self.N - 1)

    def _col(self, cam, i, j, d):
        return 2 * (j + i * self.M + cam * self.M * self.N) + d

    # --- term builders ------------------------------------------------
    def _local_rows(self, rows, cam: int, m: CamMatches, a: float):
        dst = m.dst
        w1 = h1 = None
        n_, m_ = self.N, self.M
        bw, bh = self.bw, self.bh
        target = self.targets[cam]
        for p1, p2 in zip(m.p1, m.p2):
            x1, y1 = float(p1[0]), float(p1[1])
            x2, y2 = float(p2[0]), float(p2[1])
            if not (0 <= x1 < bw and 0 <= y1 < bh and 0 <= x2 < bw and 0 <= y2 < bh):
                continue
            t1 = min(int(y1 * (n_ - 1) / bh), n_ - 2)
            l1 = min(int(x1 * (m_ - 1) / bw), m_ - 2)
            t2 = min(int(y2 * (n_ - 1) / bh), n_ - 2)
            l2 = min(int(x2 * (m_ - 1) / bw), m_ - 2)
            cw = bw / (m_ - 1)
            ch = bh / (n_ - 1)
            u1 = x1 / cw - l1
            v1 = y1 / ch - t1
            u2 = x2 / cw - l2
            v2 = y2 / ch - t2
            for d, b in ((0, target * a), (1, 0.0)):
                r = []
                for (ll, tt, uu, vv, sgn, cc) in (
                        (l1, t1, u1, v1, 1.0, cam), (l2, t2, u2, v2, -1.0, dst)):
                    r += [
                        (self._col(cc, tt, ll, d), sgn * (1 - uu) * (1 - vv) * a),
                        (self._col(cc, tt, ll + 1, d), sgn * uu * (1 - vv) * a),
                        (self._col(cc, tt + 1, ll, d), sgn * (1 - uu) * vv * a),
                        (self._col(cc, tt + 1, ll + 1, d), sgn * uu * vv * a),
                    ]
                rows.append((r, b))

    def _global_rows(self, rows, cam: int, pts: np.ndarray, a: float):
        n_, m_ = self.N, self.M
        gx = self.rest_x(np.arange(m_))
        gy = self.rest_y(np.arange(n_))
        if len(pts):
            dx = gx[None, :, None] - pts[None, None, :, 0]
            dy = gy[:, None, None] - pts[None, None, :, 1]
            near = np.any(np.hypot(dx, dy) < self.global_dist, axis=-1)
        else:
            near = np.zeros((n_, m_), bool)
        tau = (~near).astype(np.float64)
        for i in range(n_):
            for j in range(m_):
                t = tau[i, j]
                rows.append(([(self._col(cam, i, j, 0), a * t)], a * t * gx[j]))
                rows.append(([(self._col(cam, i, j, 1), a * t)], a * t * gy[i]))

    def _salience(self, band_img: np.ndarray) -> np.ndarray:
        """Per-quad, per-half-triangle salience [N-1, M-1, 4]:
        sqrt(||per-channel variance||_2 + 0.5) (meanStdDev over the triangle,
        meshwarper.cpp:543-564)."""
        c, h, w = band_img.shape
        qn, qm = self.N - 1, self.M - 1
        ch = h // qn
        cw = w // qm
        img = band_img[:, :qn * ch, :qm * cw].reshape(c, qn, ch, qm, cw)
        yy, xx = np.mgrid[0:ch, 0:cw]
        fy = (yy + 0.5) / ch
        fx = (xx + 0.5) / cw
        # 4 half-quads: diag tl-br upper/lower, diag tr-bl upper/lower
        masks = np.stack([
            fy <= fx, fy >= fx,            # cut along tl->br
            fy <= 1 - fx, fy >= 1 - fx,    # cut along tr->bl
        ]).astype(np.float64)              # [4, ch, cw]
        cnt = masks.sum(axis=(1, 2))       # [4]
        s1 = np.einsum("cyhxw,thw->cyxt", img, masks)
        s2 = np.einsum("cyhxw,thw->cyxt", img.astype(np.float64) ** 2, masks)
        mean = s1 / cnt
        var = np.maximum(s2 / cnt - mean ** 2, 0.0)      # [c, qn, qm, 4]
        return np.sqrt(np.sqrt((var ** 2).sum(axis=0)) + 0.5)

    def _smooth_rows(self, rows, cam: int, sal: np.ndarray, a: float):
        n_, m_ = self.N, self.M
        cw = (self.bw - 1) / (m_ - 1)
        ch = (self.bh - 1) / (n_ - 1)
        for i in range(n_):
            for j in range(m_):
                for t, (o1, o3) in enumerate(_TRIANGLES):
                    p1 = (j + o1[0], i + o1[1])
                    p3 = (j + o3[0], i + o3[1])
                    if not (0 <= p1[0] < m_ and 0 <= p1[1] < n_
                            and 0 <= p3[0] < m_ and 0 <= p3[1] < n_):
                        continue
                    v1 = np.array([p1[0] * cw, p1[1] * ch])
                    v2 = np.array([j * cw, i * ch])
                    v3 = np.array([p3[0] * cw, p3[1] * ch])
                    # local-frame coords of V1 in the (V3-V2, R90(V3-V2))
                    # basis with R90(x,y)=(y,-x); exact-zero residual at the
                    # rest grid by construction
                    ex, ey = v3[0] - v2[0], v3[1] - v2[1]
                    dx_, dy_ = v1[0] - v2[0], v1[1] - v2[1]
                    l2 = ex * ex + ey * ey
                    u = (dx_ * ex + dy_ * ey) / l2
                    v = (dx_ * ey - dy_ * ex) / l2
                    # salience lookup: quad containing the triangle
                    qj = min(j, p1[0], p3[0])
                    qi = min(i, p1[1], p3[1])
                    qj = min(max(qj, 0), m_ - 2)
                    qi = min(max(qi, 0), n_ - 2)
                    diag_tlbr = (p3[0] - j) * (p3[1] - i) > 0
                    half = 0 if t in (1, 2, 4, 7) else 1
                    s = sal[qi, qj, (0 if diag_tlbr else 2) + half]
                    w = a * s
                    c1x = self._col(cam, p1[1], p1[0], 0)
                    c1y = self._col(cam, p1[1], p1[0], 1)
                    c2x = self._col(cam, i, j, 0)
                    c2y = self._col(cam, i, j, 1)
                    c3x = self._col(cam, p3[1], p3[0], 0)
                    c3y = self._col(cam, p3[1], p3[0], 1)
                    # x residual: V1x - V2x - u(V3x-V2x) - v(V3y-V2y)
                    rows.append(([(c1x, w), (c2x, (u - 1) * w), (c2y, v * w),
                                  (c3x, -u * w), (c3y, -v * w)], 0.0))
                    # y residual: V1y - V2y - u(V3y-V2y) + v(V3x-V2x)
                    rows.append(([(c1y, w), (c2y, (u - 1) * w), (c2x, -v * w),
                                  (c3x, v * w), (c3y, -u * w)], 0.0))

    def _bilinear_entries(self, cam: int, x: float, y: float, d: int,
                          weight: float):
        """4 (col, coeff) entries interpolating coordinate d at (x, y)."""
        n_, m_ = self.N, self.M
        t = min(int(y * (n_ - 1) / self.bh), n_ - 2)
        l = min(int(x * (m_ - 1) / self.bw), m_ - 2)
        cw = self.bw / (m_ - 1)
        ch = self.bh / (n_ - 1)
        u = x / cw - l
        v = y / ch - t
        return [
            (self._col(cam, t, l, d), weight * (1 - u) * (1 - v)),
            (self._col(cam, t, l + 1, d), weight * u * (1 - v)),
            (self._col(cam, t + 1, l, d), weight * (1 - u) * v),
            (self._col(cam, t + 1, l + 1, d), weight * u * v),
        ]

    def _eval_mesh(self, verts: np.ndarray, cam: int, x: float, y: float):
        """Bilinearly interpolate solved vertex positions at band point."""
        n_, m_ = self.N, self.M
        t = min(int(y * (n_ - 1) / self.bh), n_ - 2)
        l = min(int(x * (m_ - 1) / self.bw), m_ - 2)
        cw = self.bw / (m_ - 1)
        ch = self.bh / (n_ - 1)
        u = x / cw - l
        v = y / ch - t
        q = (verts[cam, t, l] * (1 - u) * (1 - v)
             + verts[cam, t, l + 1] * u * (1 - v)
             + verts[cam, t + 1, l] * (1 - u) * v
             + verts[cam, t + 1, l + 1] * u * v)
        return q   # [2] (x, y)

    def _temporal_rows(self, rows, cam: int, tm: "TemporalMatches",
                       prev_verts: np.ndarray, a: float):
        """Temporal local alignment (meshwarper.cpp:711-786): the current
        mesh must move each tracked feature to where the *previous* solved
        mesh put its match — damping frame-to-frame mesh jitter."""
        for pt, pp in zip(tm.pt, tm.pp):
            xt, yt = float(pt[0]), float(pt[1])
            xp, yp = float(pp[0]), float(pp[1])
            if not (0 <= xt < self.bw and 0 <= yt < self.bh
                    and 0 <= xp < self.bw and 0 <= yp < self.bh):
                continue
            target = self._eval_mesh(prev_verts, cam, xp, yp)
            for d in (0, 1):
                rows.append((self._bilinear_entries(cam, xt, yt, d, a),
                             a * float(target[d])))

    # --- stability reuse (meshwarper.cpp:208-276) ----------------------
    def _stability_filter(self, matches: List[Optional[CamMatches]]):
        c = self.C
        fp_avg = np.zeros(c * 2)
        fp_cnt = np.zeros(c * 2)
        for idx in range(c):
            m = matches[idx]
            if m is None or len(m.p1) == 0:
                continue
            fp_avg[idx * 2] = m.p1[:, 0].sum()
            fp_cnt[idx * 2] = len(m.p1)
            fp_avg[m.dst * 2 + 1] = m.p2[:, 0].sum()
            fp_cnt[m.dst * 2 + 1] = len(m.p2)
        fp_avg = np.where(fp_cnt > 0, fp_avg / np.maximum(fp_cnt, 1), 0.0)

        use_old = np.zeros(c, bool)
        if any(m is not None for m in self.old_matches):
            for idx in range(c):
                idx2 = (idx - 1) % c
                avg = abs(fp_avg[idx * 2] - fp_avg[idx2 * 2 + 1])
                avg_prev = abs(self.prev_avg[idx * 2] - self.prev_avg[idx2 * 2 + 1])
                found = fp_avg[idx * 2] != 0 and fp_avg[idx2 * 2 + 1] != 0
                found_prev = (self.prev_avg[idx * 2] != 0
                              and self.prev_avg[idx2 * 2 + 1] != 0)
                if (abs(avg - avg_prev) < self.recalib_thresh) or \
                        (not found and found_prev):
                    use_old[idx] = True
        return fp_avg, use_old

    # --- main solve ----------------------------------------------------
    def solve(self, matches: List[Optional[CamMatches]],
              band_imgs: Optional[np.ndarray] = None,
              temporal: Optional[List[Optional["TemporalMatches"]]] = None,
              salience: Optional[np.ndarray] = None,
              ) -> np.ndarray:
        """matches[idx]: CamMatches for (src=idx, dst=idx-1 mod C) or None.
        band_imgs: f32 [C, 3, bh, bw] (for salience), OR pass precomputed
        salience [C, N-1, M-1, 4] (mesh/pipeline computes it on device so
        the full band tensor never crosses to the host).
        temporal[idx]: optional same-camera frame-(t-1) matches; only used
        when alphas[3] > 0 and a previous solve exists (defs.h ALPHAS[3]=0
        keeps this off by default, like the reference).
        Returns warped vertex positions f32 [C, N, M, 2] (x, y)."""
        if band_imgs is None and salience is None:
            raise ValueError("solve() needs band_imgs or salience")
        a_local = math.sqrt(self.alphas[0])
        a_global = math.sqrt(self.alphas[1])
        a_smooth = math.sqrt(self.alphas[2])
        a_temporal = math.sqrt(self.alphas[3]) if len(self.alphas) > 3 else 0.0

        fp_avg, use_old = self._stability_filter(matches)

        rows: list = []
        for cam in range(self.C):
            m = self.old_matches[cam] if (use_old[cam] and
                                          self.old_matches[cam] is not None) \
                else matches[cam]
            if m is not None and len(m.p1):
                self._local_rows(rows, cam, m, a_local)
                pts = m.p1
            else:
                pts = np.zeros((0, 2))
            self._global_rows(rows, cam, pts, a_global)
            sal = (salience[cam] if salience is not None
                   else self._salience(band_imgs[cam]))
            self._smooth_rows(rows, cam, sal, a_smooth)
            if (a_temporal > 0.0 and temporal is not None
                    and temporal[cam] is not None
                    and self.prev_verts is not None
                    and len(temporal[cam].pt)):
                self._temporal_rows(rows, cam, temporal[cam],
                                    self.prev_verts, a_temporal)

        # update stability state (meshwarper.cpp:313-334)
        for idx in range(self.C):
            idx2 = (idx - 1) % self.C
            if use_old[idx] and self.old_matches[idx] is not None:
                continue
            self.old_matches[idx] = matches[idx]
            self.old_matches[idx2] = matches[idx2]
            for k in (idx, idx2):
                self.prev_avg[k * 2] = fp_avg[k * 2]
                self.prev_avg[k * 2 + 1] = fp_avg[k * 2 + 1]

        nun = 2 * self.M * self.N * self.C
        data, ri, ci, b_list = [], [], [], []
        for r, (entries, b) in enumerate(rows):
            for col, val in entries:
                ri.append(r)
                ci.append(col)
                data.append(val)
            b_list.append(b)
        a = sparse.coo_matrix((data, (ri, ci)),
                              shape=(len(rows), nun)).tocsr()
        bvec = np.asarray(b_list)
        ata = (a.T @ a).toarray() + 1e-9 * np.eye(nun)
        atb = a.T @ bvec
        x = np.linalg.solve(ata, atb)

        verts = np.zeros((self.C, self.N, self.M, 2), np.float32)
        for cam in range(self.C):
            for i in range(self.N):
                for j in range(self.M):
                    verts[cam, i, j, 0] = x[self._col(cam, i, j, 0)]
                    verts[cam, i, j, 1] = x[self._col(cam, i, j, 1)]

        # soft-shrink vertex displacements toward the rest grid: feature
        # localization is ~0.2-0.5 px even with sub-pixel refinement, and a
        # sub-pixel mesh warp of sharp texture costs ~2-3 dB PSNR while
        # correcting nothing; real parallax displacements (>~2 px) pass
        # through nearly untouched (no reference equivalent — the reference
        # simply ships the jitter)
        if self.shrink_px > 0.0:
            g = np.zeros_like(verts)
            g[..., 0] = self.rest_x(np.arange(self.M))[None, None, :]
            g[..., 1] = self.rest_y(np.arange(self.N))[None, :, None]
            disp = verts - g
            mag = np.hypot(disp[..., 0], disp[..., 1])
            scale = np.maximum(0.0, 1.0 - self.shrink_px / np.maximum(mag, 1e-9))
            verts = (g + disp * scale[..., None]).astype(np.float32)

        self.prev_verts = verts
        return verts
