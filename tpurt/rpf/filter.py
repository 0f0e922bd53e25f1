"""Random Parameter Filtering: the dense per-pixel filter kernels.

Reference analog: custom/rpf.cpp ApplyRPFFilter (:497-733),
ComputeCFWeights (:356-488) and the histogram mutual-information estimator
in custom/mi.cpp.  The per-pixel neighborhood loops become batched tensor
ops: the sample buffer is an (H, W, S, 19) array; each pixel gathers its
(box x box x S) window, builds a 3-sigma feature-clustered neighborhood
mask, z-normalizes, estimates all 96 pairwise mutual informations via
one-hot histogram MATMULS (MXU work), derives the alpha/beta dependency
weights, and blends its own S samples against the neighborhood with the
joint bilateral weight — all vmapped over pixel chunks.

Sample vector layout (custom/sd.h:21-59): [0:2]=pFilm, [2:5]=L rgb,
[5:7]=pLens (the random parameters), [7:19]=n0,p0,n1,p1.

Faithfully kept reference quirks (SURVEY.md §7 "quirk preservation"):
- sigma_p = box_size // 4 with INTEGER division (rpf.cpp:531),
- sigma_c^2 = sigma_f^2 = 0.002^2 / (1 - W_r_c)^2 (:662-663),
- divide-by-zero -> 0 in z-normalization (ops.h:45-51),
- population (1/N) mean/stddev (ops.h:111-144),
- bins = max(1, floor(sqrt(N))) with degenerate ranges dumping all mass in
  bin 0 (mi.cpp:5-20), natural-log MI,
- blending uses UNNORMALIZED neighborhood colors (rpf.cpp:692),
- neighborhood = own samples (unconditionally) + window samples passing
  the STRICT 3-sigma test on all 12 features vs the pixel's own stats.

One deliberate fix: the reference's W_c_fk uses D_f_ck[i] for i in 0..11 —
an out-of-bounds read of a 3-element array (rpf.cpp:466, undefined
behavior).  We compute the intended quantity from the paper (Sen & Darabi
2011, eq. 20): D_c_fk = sum_l MI(f_k, c_l).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# column groups in the 19-vector
POS = slice(0, 2)
COL = slice(2, 5)
RND = slice(5, 7)
FEAT = slice(7, 19)
N_POS, N_COL, N_RND, N_FEAT = 2, 3, 2, 12
SD_LEN = 19

SIGMA_FC_SEED = 0.002  # rpf.cpp:533


def _mi_pairs():
    """The 96 (a, b) column-index pairs whose MI the CF weights need."""
    f = list(range(7, 19))
    p = [0, 1]
    r = [5, 6]
    c = [2, 3, 4]
    pairs = []
    for fi in f:
        for rj in r:
            pairs.append((fi, rj))  # D_r_fk
    for fi in f:
        for pj in p:
            pairs.append((fi, pj))  # D_p_fk
    for ci in c:
        for rj in r:
            pairs.append((ci, rj))  # D_r_ck
    for ci in c:
        for pj in p:
            pairs.append((ci, pj))  # D_p_ck
    for ci in c:
        for fj in f:
            pairs.append((ci, fj))  # D_f_ck / D_c_fk
    return np.asarray(pairs, np.int32)


_PAIRS = _mi_pairs()
_O_R_FK = 0
_O_P_FK = 24
_O_R_CK = 48
_O_P_CK = 54
_O_F_CK = 60  # 36 entries: (color-major, feature-minor)


def _masked_mean_std(x, mask, axis=0):
    """Population mean/std over masked rows (ops.h getMean/getStdDev)."""
    cnt = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    m = jnp.sum(x * mask, axis=axis) / cnt
    ex2 = jnp.sum(x * x * mask, axis=axis) / cnt
    var = jnp.maximum(ex2 - m * m, 0.0)
    return m, jnp.sqrt(var)


def _mutual_information(cols, mask, n, bins, b_max):
    """MI for all _PAIRS at one pixel.

    cols: (N, 19) normalized values; mask: (N, 1) float; n: scalar count;
    bins: scalar traced bin count (= max(1, floor(sqrt(n))));
    b_max: static upper bound on bins.
    Returns (96,) MI values (natural log), mirroring mi.cpp:45-90.
    """
    # ranges over the masked set (degenerate -> all mass in bin 0)
    big = jnp.float32(3.4e38)
    vmin = jnp.min(jnp.where(mask > 0, cols, big), axis=0)  # (19,)
    vmax = jnp.max(jnp.where(mask > 0, cols, -big), axis=0)
    rng = vmax - vmin
    binsf = bins.astype(jnp.float32)
    scaled = jnp.where(rng > 0, (cols - vmin) / jnp.where(rng == 0, 1.0, rng)
                       * binsf, 0.0)
    idx = jnp.clip(scaled.astype(jnp.int32), 0, bins - 1)  # (N, 19)

    # one-hot over b_max bins, masked.  bf16: the entries are exactly 0/1
    # (and the mask 0/1), and the joint counts accumulate in f32 via
    # preferred_element_type, so the histograms stay EXACT while the
    # matmul runs at the MXU's 2x bf16 rate with half the operand traffic.
    onehot = (idx[..., None] == jnp.arange(b_max)[None, None, :]).astype(
        jnp.bfloat16) * mask[..., None].astype(jnp.bfloat16)  # (N, 19, B)

    hist = jnp.sum(onehot.astype(jnp.float32), axis=0)  # (19, B) marginals

    # Joint histograms as TWO rectangular matmuls over the bin axis — an
    # MXU-shaped contraction; per-pair gathers would materialize a
    # (pixels, 96, B, N) tensor (measured 12 GB at a 4096-pixel chunk),
    # and the full 19x19 joint computes 361 pairs where only 96 are used
    # (3.8x the MACs).  The 96 _PAIRS factor exactly as
    # (c u f) x (r u p)  [60 pairs]  +  c x f  [36 pairs].
    n_rows = onehot.shape[0]
    cf = onehot[:, 2:19]  # colors + features (17 cols)
    rp = onehot[:, (0, 1, 5, 6)]  # pFilm + pLens, the random params (4)
    joint1 = jnp.dot(cf.reshape(n_rows, -1).T, rp.reshape(n_rows, -1),
                     preferred_element_type=jnp.float32
                     ).reshape(17, b_max, 4, b_max)
    joint2 = jnp.dot(onehot[:, 2:5].reshape(n_rows, -1).T,
                     onehot[:, 7:19].reshape(n_rows, -1),
                     preferred_element_type=jnp.float32
                     ).reshape(3, b_max, 12, b_max)
    a_idx = jnp.asarray(_PAIRS[:, 0])
    b_idx = jnp.asarray(_PAIRS[:, 1])
    rp_map = np.full(19, -1, np.int32)
    rp_map[[0, 1, 5, 6]] = [0, 1, 2, 3]
    j1 = joint1[jnp.clip(a_idx - 2, 0, 16), :,
                jnp.asarray(rp_map)[jnp.clip(b_idx, 0, 18)], :]
    j2 = joint2[jnp.clip(a_idx - 2, 0, 2), :,
                jnp.clip(b_idx - 7, 0, 11), :]
    is_cf = jnp.asarray(_PAIRS[:, 1] >= 7)  # (c, f) pairs live in joint2
    joint = jnp.where(is_cf[:, None, None], j2, j1)  # (96, B, B)

    total = jnp.maximum(n.astype(jnp.float32), 1.0)
    p_xy = joint / total
    p_x = (hist[a_idx] / total)[:, :, None]  # (96, B, 1)
    p_y = (hist[b_idx] / total)[:, None, :]  # (96, 1, B)
    denom = p_x * p_y
    safe = (p_xy > 0) & (denom != 0)
    mi = jnp.sum(
        jnp.where(safe, p_xy * jnp.log(jnp.where(safe, p_xy / jnp.where(
            denom == 0, 1.0, denom), 1.0)), 0.0),
        axis=(1, 2),
    )
    # MI is mathematically >= 0; TPU f32 log noise at degenerate
    # histograms yields ~-5e-8, which the 1e-12 denominator clamps in
    # _cf_weights blow up into alpha/beta far outside [0,1] — a POSITIVE
    # bilateral exponent, exp->inf, inf*0=NaN (the C++ computes MI in
    # f64 where the noise is ~1e-16 and the same guard stays benign).
    return jnp.maximum(mi, 0.0)


def _cf_weights(mi):
    """alpha_k, beta_k, W_r_c from the 96 MI values (rpf.cpp:416-487)."""
    d_r_fk = mi[_O_R_FK:_O_R_FK + 24].reshape(12, 2).sum(-1)
    d_p_fk = mi[_O_P_FK:_O_P_FK + 24].reshape(12, 2).sum(-1)
    d_r_ck = mi[_O_R_CK:_O_R_CK + 6].reshape(3, 2).sum(-1)
    d_p_ck = mi[_O_P_CK:_O_P_CK + 6].reshape(3, 2).sum(-1)
    cf = mi[_O_F_CK:_O_F_CK + 36].reshape(3, 12)
    d_f_ck = cf.sum(-1)  # (3,) per color over features
    d_c_fk = cf.sum(0)  # (12,) per feature over colors (the UB fix)

    d_f_c = d_f_ck.sum()
    d_r_c = d_r_ck.sum()
    d_p_c = d_p_ck.sum()

    eps = 0.0  # the reference divides blindly; 0/0 -> nan would propagate,
    # but D sums are strictly positive in practice (log-hist MI >= 0 with
    # equality only in degenerate pixels); guard with tiny denominators.
    w_c_fk = d_c_fk / jnp.maximum(d_f_c + d_r_c + d_p_c, 1e-12)
    w_r_fk = d_r_fk / jnp.maximum(d_r_fk + d_p_fk, 1e-12)
    w_r_ck = d_r_ck / jnp.maximum(d_r_ck + d_p_ck, 1e-12)

    alpha_k = 1.0 - w_r_ck  # (3,)
    beta_k = (1.0 - w_r_fk) * w_c_fk  # (12,)
    w_r_c = jnp.mean(w_r_ck)
    return alpha_k, beta_k, w_r_c


def _filter_pixel(own, window, window_valid, window_center, box_size, b_max,
                  mi_idx=None, sigma_seed=SIGMA_FC_SEED):
    """Filter one pixel.

    own: (S, 19) the pixel's samples; window: (K, 19) all samples in the
    box (K = box^2 * S, INCLUDING the center pixel's); window_valid: (K,)
    in-bounds flags; window_center: (K,) True for the center pixel's rows.
    mi_idx: optional STATIC row subset (into the S+K neighborhood) used
    for the mutual-information estimate when the full window would blow
    HBM — the one-hot joint-histogram tensor scales as N*19*sqrt(N), which
    is 100+ MB/pixel at box 55 (measured: a 26 GB broadcast OOM on v5e).
    The bilateral blend still uses every neighborhood sample; only the MI
    statistics (global per-pixel alpha/beta scalars) are estimated from
    the subset, with bins = floor(sqrt(subset count)) applied to the
    subset per the reference's sqrt-N rule.  Deliberate, documented
    deviation from rpf.cpp for box sizes above the cap; the reference's
    own default box set {7} (rpf.cpp:767) stays exact.
    Returns (S, 3) filtered colors.
    """
    s = own.shape[0]
    feats_own = own[:, FEAT]
    f_mean = jnp.mean(feats_own, axis=0)
    f_ex2 = jnp.mean(feats_own * feats_own, axis=0)
    f_std = jnp.sqrt(jnp.maximum(f_ex2 - f_mean * f_mean, 0.0))

    # 3-sigma clustering of non-center window samples (STRICT <)
    within = jnp.all(jnp.abs(window[:, FEAT] - f_mean) < 3.0 * f_std, axis=-1)
    cand_mask = window_valid & ~window_center & within

    # neighborhood = own samples + accepted candidates
    nb = jnp.concatenate([own, window], axis=0)  # (S + K, 19)
    nb_mask = jnp.concatenate(
        [jnp.ones((s,), bool), cand_mask], axis=0).astype(jnp.float32)[:, None]
    n = jnp.sum(nb_mask)

    # z-normalize the whole 19-vector over the neighborhood (div0 -> 0).
    # Masked-out rows are zeroed: the C++ only ever normalizes ACCEPTED
    # neighbors (rpf.cpp:592-615), while a batched where() normalizes every
    # window row — a rejected firefly (color ~2000) against a TPU one-pass
    # f32 std of ~1e-36 (exactly 0 in the C++'s arithmetic) overflows to
    # inf, and inf * beta_k(=0) = NaN in the bilateral weight even though
    # the row's weight is masked to 0 afterwards.  Accepted rows are safe:
    # |x - mu| <= sqrt(N)*sd by the population-std bound.
    mu, sd = _masked_mean_std(nb, nb_mask, axis=0)
    nb_norm = jnp.where(sd > 0, (nb - mu) / jnp.where(sd == 0, 1.0, sd), 0.0)
    nb_norm = jnp.where(nb_mask > 0, nb_norm, 0.0)
    own_norm = nb_norm[:s]

    # mutual information + dependency weights
    if mi_idx is not None:
        mi_rows = nb_norm[mi_idx]
        mi_mask = nb_mask[mi_idx]
        n_mi = jnp.sum(mi_mask)
    else:
        mi_rows, mi_mask, n_mi = nb_norm, nb_mask, n
    bins = jnp.maximum(jnp.int32(1), jnp.sqrt(n_mi).astype(jnp.int32))
    mi = _mutual_information(mi_rows, mi_mask, n_mi, bins, b_max)
    alpha_k, beta_k, w_r_c = _cf_weights(mi)

    # bilateral weights (rpf.cpp:637-678); quirks preserved: integer-divided
    # sigma_p, shared sigma_c/sigma_f inflated by the color randomness
    sigma_p = float(box_size // 4)
    sigma_p2 = max(sigma_p * sigma_p, 1e-12)
    sigma_c2 = (sigma_seed ** 2) / jnp.maximum((1.0 - w_r_c) ** 2, 1e-12)
    sigma_f2 = sigma_c2

    dp = own_norm[:, None, POS] - nb_norm[None, :, POS]  # (S, N, 2)
    dc = own_norm[:, None, COL] - nb_norm[None, :, COL]
    df = own_norm[:, None, FEAT] - nb_norm[None, :, FEAT]
    w = (jnp.exp(-jnp.sum(dp * dp, -1) / (2.0 * sigma_p2))
         * jnp.exp(-jnp.sum(dc * dc * alpha_k, -1) / (2.0 * sigma_c2))
         * jnp.exp(-jnp.sum(df * df * beta_k, -1) / (2.0 * sigma_f2)))
    w = w * nb_mask[None, :, 0]  # mask out rejected candidates

    # blend with UNNORMALIZED colors (rpf.cpp:682-717)
    sum_w = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    new_c = (w @ nb[:, COL]) / sum_w  # (S, 3)
    return new_c


from functools import lru_cache  # noqa: E402


MI_MAX_SAMPLES = 4096  # cap on the MI-estimation subset (see _filter_pixel)


@lru_cache(maxsize=32)
def _filter_run_call(box_size: int, s: int, pixel_chunk: int,
                     sigma_seed: float = SIGMA_FC_SEED):
    """Build (once per static config) the jitted chunk runner.  Module-
    level caching matters: a fresh jax.jit closure per apply call forced
    a retrace + compile-cache deserialization for every call (measured
    8 s vs 0.2 s for the whole 700x700 pass)."""
    bd = (box_size - 1) // 2
    k = box_size * box_size * s
    n_full = s + k
    if n_full > MI_MAX_SAMPLES:
        # all S own rows + an evenly strided window subset (static gather)
        stride = -(-k // (MI_MAX_SAMPLES - s))
        mi_idx = np.concatenate([np.arange(s),
                                 s + np.arange(0, k, stride)]).astype(np.int32)
        n_mi = len(mi_idx)
    else:
        mi_idx, n_mi = None, n_full
    b_max = int(math.floor(math.sqrt(n_mi))) + 1

    # the padded buffer is a jit ARGUMENT — closing over the concrete array
    # bakes it into the HLO as a constant (285 MB at 700x700x8spp, which
    # blew the remote-compile request limit)
    def one(padded, valid, py, px):
        win = jax.lax.dynamic_slice(
            padded, (py, px, 0, 0), (box_size, box_size, s, SD_LEN))
        val = jax.lax.dynamic_slice(valid, (py, px), (box_size, box_size))
        center = jnp.zeros((box_size, box_size), bool).at[bd, bd].set(True)
        own = jax.lax.dynamic_slice(padded, (py + bd, px + bd, 0, 0),
                                    (1, 1, s, SD_LEN)).reshape(s, SD_LEN)
        return _filter_pixel(own, win.reshape(k, SD_LEN),
                             jnp.repeat(val.reshape(-1), s),
                             jnp.repeat(center.reshape(-1), s),
                             box_size, b_max, mi_idx=mi_idx,
                             sigma_seed=sigma_seed)

    vone = jax.vmap(one, in_axes=(None, None, 0, 0))

    @jax.jit
    def run_call(padded, valid, cy, cx):
        def body(i, out):
            yc = jax.lax.dynamic_slice(cy, (i * pixel_chunk,), (pixel_chunk,))
            xc = jax.lax.dynamic_slice(cx, (i * pixel_chunk,), (pixel_chunk,))
            cols = vone(padded, valid, yc, xc)
            return jax.lax.dynamic_update_slice(
                out, cols, (i * pixel_chunk, 0, 0))

        out0 = jnp.zeros((cy.shape[0], s, 3), jnp.float32)
        return jax.lax.fori_loop(0, cy.shape[0] // pixel_chunk, body, out0)

    return run_call


def apply_rpf_filter(buffer: jnp.ndarray, box_size: int,
                     pixel_chunk: int = 512,
                     chunks_per_call: int = 64) -> jnp.ndarray:
    """One ApplyRPFFilter pass over the full sample buffer.

    buffer: (H, W, S, 19).  Returns the buffer with filtered colors.

    Pixels are processed in vmapped chunks of ``pixel_chunk``;
    ``chunks_per_call`` chunks run per device call inside one fori_loop
    (dispatch overhead dominated the python-loop-per-chunk version), and
    the python loop over calls keeps each call well under the device
    watchdog (~30 s).
    """
    h, w, s, _ = buffer.shape
    bd = (box_size - 1) // 2

    # HBM budget per pixel, from the three dominant intermediates (the old
    # window-only estimate missed the one-hot and OOMed at box 55 with a
    # 26 GB broadcast):
    #  - MI one-hot (N_mi, 19, B) with compare/bf16 staging (~6 B/entry)
    #  - the (19B, 19B) f32 joint-histogram matmul output
    #  - the bilateral pairwise diffs (S, N_full, 17 cols, f32, ~3 arrays)
    n_full = s + box_size * box_size * s
    n_mi = min(n_full, MI_MAX_SAMPLES)
    b = int(math.floor(math.sqrt(n_mi))) + 1
    per_pixel = (n_mi * 19 * b * 6 + (19 * b) ** 2 * 4
                 + s * n_full * 17 * 4 * 3)
    cap = max(8, int((1.5e9) // max(per_pixel, 1)))
    while pixel_chunk > cap:
        pixel_chunk //= 2
        chunks_per_call = min(chunks_per_call * 2, 512)

    padded = jnp.pad(buffer, ((bd, bd), (bd, bd), (0, 0), (0, 0)))
    valid = jnp.pad(jnp.ones((h, w), bool), ((bd, bd), (bd, bd)))

    n_pix = h * w
    per_call = pixel_chunk * chunks_per_call
    n_pad = -(-n_pix // per_call) * per_call
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys = np.pad(ys.reshape(-1), (0, n_pad - n_pix)).astype(np.int32)
    xs = np.pad(xs.reshape(-1), (0, n_pad - n_pix)).astype(np.int32)

    from tpurt.config import get_config

    run_call = _filter_run_call(box_size, s, pixel_chunk,
                                float(get_config().rpf_sigma_seed))
    out_colors = []
    for start in range(0, n_pad, per_call):
        out_colors.append(run_call(padded, valid,
                                   jnp.asarray(ys[start:start + per_call]),
                                   jnp.asarray(xs[start:start + per_call])))
    new_c = jnp.concatenate(out_colors, axis=0)[:n_pix].reshape(h, w, s, 3)
    return buffer.at[..., COL].set(new_c)
