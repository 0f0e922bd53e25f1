"""Film: RGB accumulation tensors with filter-stamped scatter-add.

Reference analog: core/film.{h,cpp} — Pixel{xyz, filterWeightSum, splatXYZ}
(film.h:81-88), FilmTile::AddSample filter-weighted accumulation (:121),
AddSplat (film.cpp:142), WriteImage (:169-195).  The tile/mutex machinery
dissolves: the film is an (H, W, 3) + (H, W) pair of device tensors and
AddSample is a scatter-add of filter-stamped contributions; merging across
devices is a psum.  Splats (for bdpt/mlt) are a second scatter-add tensor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from tpurt.render.filters import Filter
from tpurt.scene.paramset import ParamSet


class FilmState(NamedTuple):
    """Accumulation state (a pytree; functional updates)."""

    rgb: jnp.ndarray  # (H, W, 3) filter-weighted radiance sums
    weight: jnp.ndarray  # (H, W) filter weight sums
    splat: jnp.ndarray  # (H, W, 3)


class Film(NamedTuple):
    full_x: int
    full_y: int
    # crop window in pixels: [x0, x1), [y0, y1)
    crop: Tuple[int, int, int, int]
    filter: Filter
    filename: str
    scale: float
    diagonal_m: float
    max_sample_luminance: float

    @property
    def width(self) -> int:
        return self.crop[1] - self.crop[0]

    @property
    def height(self) -> int:
        return self.crop[3] - self.crop[2]

    def sample_bounds(self) -> Tuple[int, int, int, int]:
        """Film::GetSampleBounds (film.cpp:80-86): the crop pixel bounds
        expanded by the filter radius — (x0, x1, y0, y1).  Samplers must
        be built from THESE bounds (halton.cpp:74/sobol.cpp ctor), which
        matters under crop windows: halton base scales and the sobol
        pow2 tiling derive from the cropped extent, not the full film."""
        rx, ry = self.filter.radius
        x0, x1, y0, y1 = self.crop
        return (int(np.floor(x0 + 0.5 - rx)), int(np.ceil(x1 - 0.5 + rx)),
                int(np.floor(y0 + 0.5 - ry)), int(np.ceil(y1 - 0.5 + ry)))

    def initial_state(self) -> FilmState:
        h, w = self.height, self.width
        return FilmState(
            rgb=jnp.zeros((h, w, 3), jnp.float32),
            weight=jnp.zeros((h, w), jnp.float32),
            splat=jnp.zeros((h, w, 3), jnp.float32),
        )

    def _clamp(self, L: jnp.ndarray) -> jnp.ndarray:
        """maxSampleLuminance clamp (film.h:161)."""
        if not np.isfinite(self.max_sample_luminance):
            return L
        y = (0.212671 * L[:, 0] + 0.715160 * L[:, 1] + 0.072169 * L[:, 2])
        s = jnp.where(y > self.max_sample_luminance,
                      self.max_sample_luminance / jnp.maximum(y, 1e-20), 1.0)
        return L * s[:, None]

    def add_samples(self, state: FilmState, p_film: jnp.ndarray,
                    L: jnp.ndarray, ray_weight: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None) -> FilmState:
        """Filter-stamped accumulation of N samples.

        p_film: (N, 2) raster coords (continuous, crop-window space);
        L: (N, 3); ray_weight: (N,).  Each sample stamps the ceil(2r)^2
        pixel window of the reconstruction filter (FilmTile::AddSample)."""
        L = jnp.nan_to_num(L, nan=0.0, posinf=0.0, neginf=0.0)
        L = self._clamp(L)
        rx, ry = self.filter.radius
        kx = max(1, int(np.ceil(2 * rx - 1e-6)))
        ky = max(1, int(np.ceil(2 * ry - 1e-6)))
        h, w = self.height, self.width

        # continuous -> discrete (pbrt: subtract 0.5 then stamp [p-r, p+r])
        dx = p_film[:, 0] - 0.5
        dy = p_film[:, 1] - 0.5
        x0 = jnp.ceil(dx - rx).astype(jnp.int32)
        y0 = jnp.ceil(dy - ry).astype(jnp.int32)

        valid = jnp.isfinite(dx) & jnp.isfinite(dy)
        if mask is not None:
            valid &= mask

        rgb, wsum = state.rgb, state.weight
        contrib = L * ray_weight[:, None]
        for j in range(ky):
            for i in range(kx):
                px = x0 + i
                py = y0 + j
                fw = self.filter.evaluate(px.astype(jnp.float32) - dx,
                                          py.astype(jnp.float32) - dy)
                ok = valid & (px >= 0) & (px < w) & (py >= 0) & (py < h)
                fw = jnp.where(ok, fw, 0.0)
                # clip indices for the masked-out lanes
                pxc = jnp.clip(px, 0, w - 1)
                pyc = jnp.clip(py, 0, h - 1)
                rgb = rgb.at[pyc, pxc].add(contrib * fw[:, None])
                wsum = wsum.at[pyc, pxc].add(fw * ray_weight)
        return FilmState(rgb=rgb, weight=wsum, splat=state.splat)

    def add_splats(self, state: FilmState, p_film: jnp.ndarray,
                   v: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None) -> FilmState:
        """Film::AddSplat analog — unweighted scatter (bdpt/mlt/sppm)."""
        v = jnp.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
        v = self._clamp(v)
        px = jnp.floor(p_film[:, 0]).astype(jnp.int32)
        py = jnp.floor(p_film[:, 1]).astype(jnp.int32)
        ok = (px >= 0) & (px < self.width) & (py >= 0) & (py < self.height)
        if mask is not None:
            ok &= mask
        v = jnp.where(ok[:, None], v, 0.0)
        pxc = jnp.clip(px, 0, self.width - 1)
        pyc = jnp.clip(py, 0, self.height - 1)
        return FilmState(rgb=state.rgb, weight=state.weight,
                         splat=state.splat.at[pyc, pxc].add(v))

    def to_image(self, state: FilmState, splat_scale: float = 1.0) -> np.ndarray:
        """Resolve to an (H, W, 3) image (Film::WriteImage :169-195)."""
        rgb = np.asarray(state.rgb, dtype=np.float64)
        wsum = np.asarray(state.weight, dtype=np.float64)
        img = rgb / np.where(wsum > 0, wsum, 1.0)[..., None]
        img = img + splat_scale * np.asarray(state.splat, dtype=np.float64)
        img = img * self.scale
        return np.maximum(img, 0.0).astype(np.float32)

    def write(self, state: FilmState, splat_scale: float = 1.0,
              filename: Optional[str] = None) -> str:
        from tpurt.io.image import write_image

        out = filename or self.filename
        write_image(out, self.to_image(state, splat_scale))
        return out


def make_film(ps: ParamSet, filt: Filter, quick: bool = False,
              crop_override=None) -> Film:
    """MakeFilm (api.cpp :860-869 -> film.cpp CreateFilm) defaults."""
    xres = ps.find_one_int("xresolution", 1280)
    yres = ps.find_one_int("yresolution", 720)
    if quick:
        xres = max(1, xres // 4)
        yres = max(1, yres // 4)
    crop = ps.find_float_array("cropwindow")
    if crop_override is not None:
        crop = np.asarray(crop_override, dtype=np.float64)
    if crop is not None and len(crop) == 4:
        cx0, cx1 = sorted((float(crop[0]), float(crop[1])))
        cy0, cy1 = sorted((float(crop[2]), float(crop[3])))
    else:
        cx0, cx1, cy0, cy1 = 0.0, 1.0, 0.0, 1.0
    # pbrt crop pixel bounds (film.cpp ctor): ceil(res * c0), ceil(res * c1)
    # — computed in FLOAT (f32) there, which matters: 0.45f*700 rounds just
    # below 315 while the f64 product lands just above, shifting the bound.
    def _cb(res, c):
        return int(np.ceil(np.float32(res) * np.float32(c)))

    x0 = _cb(xres, cx0)
    x1 = max(x0 + 1, _cb(xres, cx1))
    y0 = _cb(yres, cy0)
    y1 = max(y0 + 1, _cb(yres, cy1))
    return Film(
        full_x=xres,
        full_y=yres,
        crop=(x0, x1, y0, y1),
        filter=filt,
        filename=ps.find_one_string("filename", "pbrt.exr"),
        scale=ps.find_one_float("scale", 1.0),
        diagonal_m=ps.find_one_float("diagonal", 35.0) * 0.001,
        max_sample_luminance=ps.find_one_float("maxsampleluminance",
                                               np.inf),
    )
