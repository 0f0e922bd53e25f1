"""Straightforward numpy implementation of the reference RPF filter
(custom/rpf.cpp / mi.cpp semantics, float64) used as the test oracle for
the vectorized JAX kernels.  Deliberately loop-based and literal."""

import numpy as np

POS = slice(0, 2)
COL = slice(2, 5)
RND = slice(5, 7)
FEAT = slice(7, 19)


def histogram(data, bins, vmin, vmax):
    hist = np.zeros(bins, np.int64)
    if vmax == vmin:
        hist[0] = len(data)
        return hist
    for v in data:
        b = int((v - vmin) / (vmax - vmin) * bins)
        hist[min(max(b, 0), bins - 1)] += 1
    return hist


def joint_histogram(x, y, bx, by, minx, maxx, miny, maxy):
    j = np.zeros((bx, by), np.int64)
    for xi, yi in zip(x, y):
        b1 = 0
        if maxx != minx:
            b1 = min(max(int((xi - minx) / (maxx - minx) * bx), 0), bx - 1)
        b2 = 0
        if maxy != miny:
            b2 = min(max(int((yi - miny) / (maxy - miny) * by), 0), by - 1)
        j[b1, b2] += 1
    return j


def mutual_information(x, y):
    minx, maxx = x.min(), x.max()
    miny, maxy = y.min(), y.max()
    bx = max(1, int(np.sqrt(len(x))))
    by = max(1, int(np.sqrt(len(y))))
    hx = histogram(x, bx, minx, maxx)
    hy = histogram(y, by, miny, maxy)
    j = joint_histogram(x, y, bx, by, minx, maxx, miny, maxy)
    n = float(len(x))
    mi = 0.0
    for a in range(bx):
        for b in range(by):
            pxy = j[a, b] / n
            pp = (hx[a] / n) * (hy[b] / n)
            if pxy > 0 and pp != 0:
                mi += pxy * np.log(pxy / pp)
    return mi


def cf_weights(nb):
    """nb: (N, 19) normalized neighborhood.  Returns (alpha(3), beta(12),
    W_r_c), with the intended D_c_fk (the reference reads OOB here)."""
    d_r_fk = np.zeros(12)
    d_p_fk = np.zeros(12)
    d_r_ck = np.zeros(3)
    d_p_ck = np.zeros(3)
    d_f_ck = np.zeros(3)
    cf = np.zeros((3, 12))
    for i in range(12):
        for j in range(2):
            d_r_fk[i] += mutual_information(nb[:, 7 + i], nb[:, 5 + j])
        for j in range(2):
            d_p_fk[i] += mutual_information(nb[:, 7 + i], nb[:, j])
    for i in range(3):
        for j in range(2):
            d_r_ck[i] += mutual_information(nb[:, 2 + i], nb[:, 5 + j])
        for j in range(2):
            d_p_ck[i] += mutual_information(nb[:, 2 + i], nb[:, j])
        for j in range(12):
            m = mutual_information(nb[:, 2 + i], nb[:, 7 + j])
            d_f_ck[i] += m
            cf[i, j] = m
    d_c_fk = cf.sum(0)
    d_f_c, d_r_c, d_p_c = d_f_ck.sum(), d_r_ck.sum(), d_p_ck.sum()
    w_c_fk = d_c_fk / (d_f_c + d_r_c + d_p_c)
    w_r_fk = d_r_fk / (d_r_fk + d_p_fk)
    w_r_ck = d_r_ck / (d_r_ck + d_p_ck)
    alpha = 1.0 - w_r_ck
    beta = (1.0 - w_r_fk) * w_c_fk
    return alpha, beta, w_r_ck.mean()


def filter_buffer(buffer, box_size):
    """Full ApplyRPFFilter pass (returns filtered copy).
    buffer: (H, W, S, 19) float."""
    h, w, s, _ = buffer.shape
    bd = (box_size - 1) // 2
    out = buffer.copy()
    sigma_p = box_size // 4  # integer division, as in rpf.cpp:531
    seed = 0.002
    for py in range(h):
        for px in range(w):
            own = buffer[py, px]  # (S, 19)
            fmean = own[:, FEAT].mean(0)
            fstd = np.sqrt(np.maximum(
                (own[:, FEAT] ** 2).mean(0) - fmean ** 2, 0.0))
            nb = [own[k] for k in range(s)]
            for yn in range(py - bd, py + bd + 1):
                for xn in range(px - bd, px + bd + 1):
                    if (yn == py and xn == px) or not (
                            0 <= yn < h and 0 <= xn < w):
                        continue
                    for k in range(s):
                        sf = buffer[yn, xn, k]
                        if np.all(np.abs(sf[FEAT] - fmean) < 3 * fstd):
                            nb.append(sf)
            nb = np.stack(nb)
            mu = nb.mean(0)
            sd = np.sqrt(np.maximum((nb ** 2).mean(0) - mu ** 2, 0.0))
            nbn = np.where(sd > 0, (nb - mu) / np.where(sd == 0, 1, sd), 0.0)
            ownn = nbn[:s]
            alpha, beta, w_r_c = cf_weights(nbn)
            sc2 = seed * seed / (1 - w_r_c) / (1 - w_r_c)
            sp2 = float(sigma_p) ** 2
            for i in range(s):
                dp = ownn[i, POS] - nbn[:, POS]
                dc = ownn[i, COL] - nbn[:, COL]
                df = ownn[i, FEAT] - nbn[:, FEAT]
                wij = (np.exp(-np.sum(dp * dp, -1) / (2 * sp2))
                       * np.exp(-np.sum(dc * dc * alpha, -1) / (2 * sc2))
                       * np.exp(-np.sum(df * df * beta, -1) / (2 * sc2)))
                out[py, px, i, COL] = (wij @ nb[:, COL]) / wij.sum()
    return out
