// RgbaInputFile / RgbaOutputFile shim — see ImfRgba.h. Scanline EXR,
// HALF or FLOAT channels, NONE compression only.
#ifndef SHIM_IMF_RGBA_FILE_H
#define SHIM_IMF_RGBA_FILE_H

#include <cstdio>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

#include "ImfRgba.h"

namespace Imath {

struct V2i {
    int x = 0, y = 0;
    V2i() = default;
    V2i(int x_, int y_) : x(x_), y(y_) {}
};

struct Box2i {
    V2i min, max;
    Box2i() = default;
    Box2i(const V2i &mn, const V2i &mx) : min(mn), max(mx) {}
};

}  // namespace Imath

namespace Imf {

namespace detail {

inline void wr(std::FILE *f, const void *p, size_t n) {
    if (std::fwrite(p, 1, n, f) != n)
        throw std::runtime_error("EXR shim: short write");
}
inline void wi32(std::FILE *f, int32_t v) { wr(f, &v, 4); }
inline void wf32(std::FILE *f, float v) { wr(f, &v, 4); }
inline void wu8(std::FILE *f, uint8_t v) { wr(f, &v, 1); }
inline void wstr(std::FILE *f, const char *s) {
    wr(f, s, std::strlen(s) + 1);
}
inline void wattr(std::FILE *f, const char *name, const char *type,
                  int32_t size) {
    wstr(f, name);
    wstr(f, type);
    wi32(f, size);
}

inline void rd(std::FILE *f, void *p, size_t n) {
    if (std::fread(p, 1, n, f) != n)
        throw std::runtime_error("EXR shim: short read");
}
inline int32_t ri32(std::FILE *f) {
    int32_t v;
    rd(f, &v, 4);
    return v;
}
inline std::string rstr(std::FILE *f) {
    std::string s;
    for (;;) {
        int c = std::fgetc(f);
        if (c == EOF) throw std::runtime_error("EXR shim: EOF in string");
        if (c == 0) break;
        s.push_back((char)c);
    }
    return s;
}

}  // namespace detail

class RgbaOutputFile {
  public:
    RgbaOutputFile(const char *name, const Imath::Box2i &displayWindow,
                   const Imath::Box2i &dataWindow, RgbaChannels channels)
        : dw_(dataWindow), disp_(displayWindow),
          rgba_(channels == WRITE_RGBA) {
        open(name);
    }
    RgbaOutputFile(const char *name, int width, int height,
                   RgbaChannels channels = WRITE_RGBA)
        : dw_(Imath::V2i(0, 0), Imath::V2i(width - 1, height - 1)),
          disp_(dw_), rgba_(channels == WRITE_RGBA) {
        open(name);
    }
    ~RgbaOutputFile() {
        if (f_) std::fclose(f_);
    }
    void setFrameBuffer(const Rgba *base, size_t xStride, size_t yStride) {
        base_ = base;
        xs_ = xStride;
        ys_ = yStride;
    }
    void writePixels(int numScanLines) {
        using namespace detail;
        int width = dw_.max.x - dw_.min.x + 1;
        int nchan = rgba_ ? 4 : 3;
        std::vector<uint16_t> line((size_t)width);
        for (int i = 0; i < numScanLines; ++i, ++curY_) {
            long off = std::ftell(f_);
            offsets_.push_back((uint64_t)off);
            wi32(f_, curY_);
            wi32(f_, nchan * width * 2);
            // channels in file order: (A,)B,G,R — alphabetical, as the
            // header declares them
            for (int c = 0; c < nchan; ++c) {
                for (int x = 0; x < width; ++x) {
                    const Rgba &p =
                        base_[(size_t)(dw_.min.x + x) * xs_ +
                              (size_t)curY_ * ys_];
                    uint16_t bits;
                    if (rgba_) {
                        const half16 *sel[4] = {&p.a, &p.b, &p.g, &p.r};
                        bits = sel[c]->bits;
                    } else {
                        const half16 *sel[3] = {&p.b, &p.g, &p.r};
                        bits = sel[c]->bits;
                    }
                    line[(size_t)x] = bits;
                }
                wr(f_, line.data(), line.size() * 2);
            }
        }
        if (curY_ > dw_.max.y) finish();
    }

  private:
    void open(const char *name) {
        using namespace detail;
        f_ = std::fopen(name, "wb");
        if (!f_)
            throw std::runtime_error(std::string("EXR shim: cannot open ") +
                                     name);
        curY_ = dw_.min.y;
        const uint8_t magic[4] = {0x76, 0x2f, 0x31, 0x01};
        wr(f_, magic, 4);
        wi32(f_, 2);  // version, scanline
        // channels (alphabetical: A?, B, G, R), HALF
        int nchan = rgba_ ? 4 : 3;
        const char *names[4];
        if (rgba_) {
            names[0] = "A"; names[1] = "B"; names[2] = "G"; names[3] = "R";
        } else {
            names[0] = "B"; names[1] = "G"; names[2] = "R";
        }
        int32_t chSize = 0;
        for (int i = 0; i < nchan; ++i)
            chSize += (int32_t)std::strlen(names[i]) + 1 + 16;
        chSize += 1;  // terminating null
        wattr(f_, "channels", "chlist", chSize);
        for (int i = 0; i < nchan; ++i) {
            wstr(f_, names[i]);
            wi32(f_, 1);  // HALF
            wu8(f_, 0);   // pLinear
            wu8(f_, 0); wu8(f_, 0); wu8(f_, 0);
            wi32(f_, 1);  // xSampling
            wi32(f_, 1);  // ySampling
        }
        wu8(f_, 0);
        wattr(f_, "compression", "compression", 1);
        wu8(f_, 0);  // NONE
        wattr(f_, "dataWindow", "box2i", 16);
        wi32(f_, dw_.min.x); wi32(f_, dw_.min.y);
        wi32(f_, dw_.max.x); wi32(f_, dw_.max.y);
        wattr(f_, "displayWindow", "box2i", 16);
        wi32(f_, disp_.min.x); wi32(f_, disp_.min.y);
        wi32(f_, disp_.max.x); wi32(f_, disp_.max.y);
        wattr(f_, "lineOrder", "lineOrder", 1);
        wu8(f_, 0);  // increasing Y
        wattr(f_, "pixelAspectRatio", "float", 4);
        wf32(f_, 1.f);
        wattr(f_, "screenWindowCenter", "v2f", 8);
        wf32(f_, 0.f); wf32(f_, 0.f);
        wattr(f_, "screenWindowWidth", "float", 4);
        wf32(f_, 1.f);
        wu8(f_, 0);  // end of header
        tableOff_ = std::ftell(f_);
        int height = dw_.max.y - dw_.min.y + 1;
        std::vector<uint64_t> zeros((size_t)height, 0);
        wr(f_, zeros.data(), zeros.size() * 8);
    }
    void finish() {
        using namespace detail;
        std::fseek(f_, tableOff_, SEEK_SET);
        wr(f_, offsets_.data(), offsets_.size() * 8);
        std::fclose(f_);
        f_ = nullptr;
    }

    std::FILE *f_ = nullptr;
    Imath::Box2i dw_, disp_;
    bool rgba_;
    const Rgba *base_ = nullptr;
    size_t xs_ = 1, ys_ = 0;
    int curY_ = 0;
    long tableOff_ = 0;
    std::vector<uint64_t> offsets_;
};

class RgbaInputFile {
  public:
    explicit RgbaInputFile(const char *name) {
        using namespace detail;
        f_ = std::fopen(name, "rb");
        if (!f_)
            throw std::runtime_error(std::string("EXR shim: cannot open ") +
                                     name);
        uint8_t magic[4];
        rd(f_, magic, 4);
        if (!(magic[0] == 0x76 && magic[1] == 0x2f && magic[2] == 0x31 &&
              magic[3] == 0x01))
            throw std::runtime_error("EXR shim: bad magic");
        int32_t version = ri32(f_);
        if ((version & 0x200) != 0)
            throw std::runtime_error("EXR shim: tiled EXR unsupported");
        for (;;) {
            std::string aname = rstr(f_);
            if (aname.empty()) break;
            std::string atype = rstr(f_);
            int32_t size = ri32(f_);
            long next = std::ftell(f_) + size;
            if (aname == "channels") {
                for (;;) {
                    std::string cn = rstr(f_);
                    if (cn.empty()) break;
                    Chan c;
                    c.name = cn;
                    c.type = ri32(f_);  // 0 UINT, 1 HALF, 2 FLOAT
                    uint8_t dummy[4];
                    rd(f_, dummy, 4);
                    ri32(f_);  // xSampling
                    ri32(f_);  // ySampling
                    chans_.push_back(c);
                }
            } else if (aname == "compression") {
                uint8_t c;
                rd(f_, &c, 1);
                if (c != 0)
                    throw std::runtime_error(
                        "EXR shim: only NONE compression supported");
            } else if (aname == "dataWindow") {
                dw_.min.x = ri32(f_); dw_.min.y = ri32(f_);
                dw_.max.x = ri32(f_); dw_.max.y = ri32(f_);
            } else if (aname == "displayWindow") {
                disp_.min.x = ri32(f_); disp_.min.y = ri32(f_);
                disp_.max.x = ri32(f_); disp_.max.y = ri32(f_);
            }
            std::fseek(f_, next, SEEK_SET);
        }
        int height = dw_.max.y - dw_.min.y + 1;
        std::fseek(f_, 8 * height, SEEK_CUR);  // skip offset table
        dataOff_ = std::ftell(f_);
    }
    ~RgbaInputFile() {
        if (f_) std::fclose(f_);
    }
    Imath::Box2i dataWindow() const { return dw_; }
    Imath::Box2i displayWindow() const { return disp_; }
    void setFrameBuffer(Rgba *base, size_t xStride, size_t yStride) {
        base_ = base;
        xs_ = xStride;
        ys_ = yStride;
    }
    void readPixels(int minY, int maxY) {
        using namespace detail;
        std::fseek(f_, dataOff_, SEEK_SET);
        int width = dw_.max.x - dw_.min.x + 1;
        int height = dw_.max.y - dw_.min.y + 1;
        std::vector<float> line((size_t)width);
        for (int i = 0; i < height; ++i) {
            int32_t y = ri32(f_);
            ri32(f_);  // data size
            for (const Chan &c : chans_) {
                if (c.type == 1) {
                    std::vector<uint16_t> hl((size_t)width);
                    rd(f_, hl.data(), hl.size() * 2);
                    for (int x = 0; x < width; ++x)
                        line[(size_t)x] = shimexr::halfToFloat(hl[(size_t)x]);
                } else if (c.type == 2) {
                    rd(f_, line.data(), line.size() * 4);
                } else {
                    std::fseek(f_, 4L * width, SEEK_CUR);
                    continue;
                }
                if (y < minY || y > maxY) continue;
                for (int x = 0; x < width; ++x) {
                    Rgba &p = base_[(size_t)(dw_.min.x + x) * xs_ +
                                    (size_t)y * ys_];
                    float v = line[(size_t)x];
                    if (c.name == "R") p.r = v;
                    else if (c.name == "G") p.g = v;
                    else if (c.name == "B") p.b = v;
                    else if (c.name == "A") p.a = v;
                    else if (c.name == "Y") { p.r = v; p.g = v; p.b = v; }
                }
            }
        }
    }

  private:
    struct Chan {
        std::string name;
        int32_t type = 1;
    };
    std::FILE *f_ = nullptr;
    Imath::Box2i dw_, disp_;
    std::vector<Chan> chans_;
    long dataOff_ = 0;
    Rgba *base_ = nullptr;
    size_t xs_ = 1, ys_ = 0;
};

}  // namespace Imf

#endif  // SHIM_IMF_RGBA_FILE_H
