"""bsdftest — Monte-Carlo sanity harness for the BSDF lobe library.

Reference analog: tools/bsdftest.cpp (439 LoC): samples each BSDF with
several strategies and prints estimated reflectance vs expectation.  Here:
for each lobe configuration, estimate the hemispherical-directional
reflectance rho(wo) = E[f * |cos| / pdf] via (a) BSDF importance sampling
and (b) uniform hemisphere sampling, and check they agree — a chi^2-style
consistency check between f(), pdf() and Sample_f().
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(n_samples: int = 50000, seed: int = 0, quiet: bool = False) -> int:
    import jax.numpy as jnp

    from tpurt.render.bsdf import (
        FRESNEL_CONDUCTOR,
        FRESNEL_DIELECTRIC,
        bsdf_f,
        bsdf_pdf,
        bsdf_sample,
        zero_lobes,
    )

    rng = np.random.default_rng(seed)
    failures = 0

    configs = [
        ("lambertian kd=0.6", dict(kd=[0.6, 0.6, 0.6]), 0.6),
        ("oren-nayar sigma=20", dict(kd=[0.5, 0.5, 0.5], sigma=20.0), None),
        ("ggx dielectric rough=0.2", dict(ks=[1, 1, 1], alpha=0.2,
                                          fresnel=FRESNEL_DIELECTRIC), None),
        ("ggx conductor rough=0.3", dict(ks=[1, 1, 1], alpha=0.3,
                                         fresnel=FRESNEL_CONDUCTOR), None),
        ("plastic kd=0.4 ks=0.4", dict(kd=[0.4, 0.4, 0.4], ks=[0.4, 0.4, 0.4],
                                       alpha=0.1), None),
    ]

    for name, cfg, expect in configs:
        n = n_samples
        lp = zero_lobes(n)
        if "kd" in cfg:
            lp = lp._replace(kd=jnp.broadcast_to(
                jnp.asarray(cfg["kd"], jnp.float32), (n, 3)))
        if "sigma" in cfg:
            s = np.deg2rad(cfg["sigma"])
            a = 1 - s * s / (2 * (s * s + 0.33))
            b = 0.45 * s * s / (s * s + 0.09)
            lp = lp._replace(oren_a=jnp.full((n,), a, jnp.float32),
                             oren_b=jnp.full((n,), b, jnp.float32))
        if "ks" in cfg:
            lp = lp._replace(ks=jnp.broadcast_to(
                jnp.asarray(cfg["ks"], jnp.float32), (n, 3)))
        if "alpha" in cfg:
            lp = lp._replace(alpha_x=jnp.full((n,), cfg["alpha"], jnp.float32),
                             alpha_y=jnp.full((n,), cfg["alpha"], jnp.float32))
        if "fresnel" in cfg:
            lp = lp._replace(fresnel_kind=jnp.full((n,), cfg["fresnel"],
                                                   jnp.int32))
        if cfg.get("fresnel") == FRESNEL_CONDUCTOR:
            from tpurt.render.materials import COPPER_ETA_RGB, COPPER_K_RGB

            lp = lp._replace(
                eta3=jnp.broadcast_to(jnp.asarray(COPPER_ETA_RGB, jnp.float32),
                                      (n, 3)),
                k3=jnp.broadcast_to(jnp.asarray(COPPER_K_RGB, jnp.float32),
                                    (n, 3)))

        # fixed outgoing direction at 30 degrees
        wo = jnp.broadcast_to(
            jnp.asarray([np.sin(np.pi / 6), 0.0, np.cos(np.pi / 6)],
                        jnp.float32), (n, 3))

        # (a) importance sampling
        u = rng.uniform(0, 1, (3, n)).astype(np.float32)
        wi, f, pdf, is_spec, _ = bsdf_sample(lp, wo, jnp.asarray(u[0]),
                                             jnp.asarray(u[1]),
                                             jnp.asarray(u[2]))
        ok = np.asarray(pdf) > 0
        est_is = np.where(ok[:, None],
                          np.asarray(f) * np.abs(np.asarray(wi)[:, 2:3])
                          / np.maximum(np.asarray(pdf)[:, None], 1e-20),
                          0.0).mean(0)

        # (b) uniform hemisphere
        z = rng.uniform(0, 1, n).astype(np.float32)
        r = np.sqrt(np.maximum(0, 1 - z * z))
        phi = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        wi_u = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], -1))
        f_u = np.asarray(bsdf_f(lp, wo, wi_u))
        est_uni = (f_u * z[:, None] * (2 * np.pi)).mean(0)

        # (c) pdf normalization: E_uniform[pdf] * 2pi ~ total sampled measure
        pdf_u = np.asarray(bsdf_pdf(lp, wo, wi_u))
        pdf_int = (pdf_u * 2 * np.pi).mean()

        rel = np.abs(est_is - est_uni) / np.maximum(est_uni, 1e-3)
        ok1 = (rel < 0.08).all()
        ok2 = expect is None or abs(est_is.mean() - expect) < 0.05
        ok3 = pdf_int < 1.15  # pdf integrates to <= 1 over the hemisphere
        status = "ok" if (ok1 and ok2 and ok3) else "FAIL"
        if status == "FAIL":
            failures += 1
        if not quiet or status == "FAIL":
            print(f"{name:34s} rho_is={est_is.mean():.4f} "
                  f"rho_uniform={est_uni.mean():.4f} pdf_int={pdf_int:.3f} "
                  f"[{status}]")
    return failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bsdftest")
    ap.add_argument("--samples", type=int, default=50000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    failures = run(args.samples, args.seed)
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
