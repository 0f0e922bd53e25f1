#!/usr/bin/env python3
"""Generate the NaN-guarded RPF measurement harness from the reference's
custom/rpf.cpp (read-only; never modified in place).

The stock reference hard-exits inside its own RPF filter on its own demo
scene (scenes/sample.pbrt): `PRIME ERROR. Prime:-nan` from the NaN check
at rpf.cpp:702-705.  Two genuine bugs in the reference cause this:

1. Blind 0/0 divisions in ComputeCFWeights (rpf.cpp:464-471): on a
   degenerate pixel whose samples are all identical (e.g. pure background
   at low spp) every mutual-information term is 0, so
   W_r_ck = D_r_ck / (D_r_ck + D_p_ck) = 0/0 = NaN, which propagates into
   W_r_c -> sigma_c^2 -> every bilateral weight.
2. An out-of-bounds read: `W_c_fk[i] = D_f_ck[i] / ...` indexes the
   3-element color array D_f_ck with feature index i in [0,12)
   (rpf.cpp:464), reading adjacent stack memory (UB) into Beta_k.

3. SampleData::normalized (sd.h:224-235) divides by the neighborhood
   stdDev with no zero guard: any channel that is CONSTANT over the
   neighborhood (flat background color, uniform world-z, ...) yields
   (x - mean)/0 = 0/0 = NaN in every normalized sample, which reaches
   the bilateral weights.  Box 7 on sample.pbrt happens to dodge it;
   the multi-scale {55,35,17,7} schedule (BASELINE config 3) does not.
   Guard: stdDev channels == 0 are set to 1 before normalizing, so
   constant channels normalize to 0 — the same convention as tpurt's
   z-norm (tpurt/rpf/filter.py:227).

This script applies the same two fixes tpurt's filter uses
(tpurt/rpf/filter.py:_cf_weights): tiny-denominator guards, and a proper
per-feature dependency D_c_fk[k] = sum_c MI(color_c, feature_k).  The
result is written to the given output path and compiled as pbrt-patched,
used ONLY to quantify what the reference's RPF does when it survives.
"""
import sys


def main(src_path: str, dst_path: str) -> None:
    src = open(src_path).read()
    n0 = len(src)
    src = src.replace(
        '#include "custom/rpf.h"',
        '#include "custom/rpf.h"\n#include <algorithm>', 1)
    src = src.replace(
        """      // For each pair color x feature compute mutual information
      for (int j = 0; j < SD_N_FEATURES; ++j) {
        D_f_ck[i] += MutualInformation(colors_data[i], features_data[j]);
      }""",
        """      // For each pair color x feature compute mutual information
      for (int j = 0; j < SD_N_FEATURES; ++j) {
        double mi_cf = MutualInformation(colors_data[i], features_data[j]);
        D_f_ck[i] += mi_cf;
        D_c_fk_fix[j] += mi_cf;  // per-feature sum (OOB-read fix)
      }""")
    src = src.replace(
        """    for (int i = 0; i < SD_N_COLOR; ++i) {
      // For each pair color x random compute mutual information""",
        """    SampleF D_c_fk_fix;
    for (int i = 0; i < SD_N_FEATURES; ++i) D_c_fk_fix[i] = 0;
    for (int i = 0; i < SD_N_COLOR; ++i) {
      // For each pair color x random compute mutual information""")
    src = src.replace(
        "W_c_fk[i] = D_f_ck[i] / (D_f_c + D_r_c + D_p_c);",
        "W_c_fk[i] = D_c_fk_fix[i] / "
        "std::max(D_f_c + D_r_c + D_p_c, 1e-12);")
    src = src.replace(
        """          auto mean = getMean(vectors);
          auto stdDev = getStdDev(vectors, mean);""",
        """          auto mean = getMean(vectors);
          auto stdDev = getStdDev(vectors, mean);
          // constant channels normalize to 0, not 0/0 (bug 3)
          for (size_t zi = 0; zi < stdDev.size(); ++zi)
            if (!(stdDev[zi] > 0)) stdDev[zi] = 1.0;""")
    src = src.replace(
        "W_r_fk[i] = D_r_fk[i] / (D_r_fk[i] + D_p_fk[i]);",
        "W_r_fk[i] = D_r_fk[i] / std::max(D_r_fk[i] + D_p_fk[i], 1e-12);")
    src = src.replace(
        "W_r_ck[i] = D_r_ck[i] / (D_r_ck[i] + D_p_ck[i]);",
        "W_r_ck[i] = D_r_ck[i] / std::max(D_r_ck[i] + D_p_ck[i], 1e-12);")
    # measurement-harness convenience: the multi-scale box schedule is a
    # compile-time constant in the reference (rpf.cpp:767, the {55,35,17,7}
    # list is commented out there) — let BASELINE config 3 select it via
    # RPF_BOX_SIZES=55,35,17,7 without another binary
    src = src.replace(
        "std::vector<int> box_sizes = {7};",
        """std::vector<int> box_sizes = {7};
    if (const char *bs_env = std::getenv("RPF_BOX_SIZES")) {
      box_sizes.clear();
      std::stringstream bs_ss(bs_env);
      std::string tok;
      while (std::getline(bs_ss, tok, ',')) box_sizes.push_back(std::stoi(tok));
    }""", 1)
    # measurement-harness convenience 2: the bilateral sigma seed is a
    # hardcoded near-no-op 0.002 (rpf.cpp:533) — the strong-filter parity
    # gate drives both implementations at a visible strength via
    # RPF_SIGMA_SEED (tpurt side: config.rpf_sigma_seed)
    src = src.replace(
        "double sigma_fc_seed = 0.002;",
        """double sigma_fc_seed = 0.002;
    if (const char *ss_env = std::getenv("RPF_SIGMA_SEED"))
      sigma_fc_seed = std::atof(ss_env);""", 1)
    src = src.replace(
        '#include <algorithm>',
        '#include <algorithm>\n#include <cstdlib>\n#include <sstream>', 1)
    assert src.count("D_c_fk_fix") == 4, "patch anchors not found"
    assert src.count("std::max(D_") == 3, "division guards not applied"
    assert src.count("stdDev[zi]") == 2, "z-norm zero guard not applied"
    assert src.count("RPF_BOX_SIZES") == 1, "box-size env hook not applied"
    assert src.count("RPF_SIGMA_SEED") == 1, "sigma-seed env hook not applied"
    assert len(src) > n0
    open(dst_path, "w").write(src)
    print(f"patched rpf.cpp -> {dst_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
