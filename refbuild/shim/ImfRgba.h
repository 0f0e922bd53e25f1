// Minimal OpenEXR-compatible shim (header-only): the tiny API surface the
// reference uses — Imf::Rgba / RgbaInputFile / RgbaOutputFile with a real
// EXR scanline codec (HALF channels, NONE compression, increasing-Y).
// Files written here are readable by any spec-compliant EXR reader.
#ifndef SHIM_IMF_RGBA_H
#define SHIM_IMF_RGBA_H

#include <cstdint>
#include <cstring>

namespace shimexr {

inline uint16_t floatToHalf(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t e = (int32_t)((x >> 23) & 0xffu) - 127 + 15;
    uint32_t m = x & 0x7fffffu;
    if (((x >> 23) & 0xffu) == 0xffu)  // inf/nan
        return (uint16_t)(sign | 0x7c00u | (m ? 0x200u : 0));
    if (e <= 0) {  // subnormal or zero
        if (e < -10) return (uint16_t)sign;
        m |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - e);
        uint32_t half_m = m >> shift;
        // round to nearest even
        if ((m >> (shift - 1)) & 1u) half_m += 1;
        return (uint16_t)(sign | half_m);
    }
    if (e >= 31) return (uint16_t)(sign | 0x7c00u);  // overflow -> inf
    uint32_t half = sign | ((uint32_t)e << 10) | (m >> 13);
    if (m & 0x1000u) half += 1;  // round
    return (uint16_t)half;
}

inline float halfToFloat(uint16_t h) {
    uint32_t sign = ((uint32_t)h & 0x8000u) << 16;
    uint32_t e = (h >> 10) & 0x1fu;
    uint32_t m = h & 0x3ffu;
    uint32_t out;
    if (e == 0) {
        if (m == 0) {
            out = sign;
        } else {  // subnormal
            e = 127 - 15 + 1;
            while (!(m & 0x400u)) {
                m <<= 1;
                --e;
            }
            m &= 0x3ffu;
            out = sign | (e << 23) | (m << 13);
        }
    } else if (e == 31) {
        out = sign | 0x7f800000u | (m << 13);
    } else {
        out = sign | ((e - 15 + 127) << 23) | (m << 13);
    }
    float f;
    std::memcpy(&f, &out, 4);
    return f;
}

}  // namespace shimexr

namespace Imf {

struct half16 {
    uint16_t bits = 0;
    half16() = default;
    half16(float f) : bits(shimexr::floatToHalf(f)) {}
    operator float() const { return shimexr::halfToFloat(bits); }
};

struct Rgba {
    half16 r, g, b, a;
    Rgba() = default;
    Rgba(float r_, float g_, float b_, float a_ = 1.f)
        : r(r_), g(g_), b(b_), a(a_) {}
};

enum RgbaChannels { WRITE_RGB = 0x7, WRITE_RGBA = 0xf };

}  // namespace Imf

#endif  // SHIM_IMF_RGBA_H
