#ifndef SHIM_IMF_ARRAY_H
#define SHIM_IMF_ARRAY_H

#include <vector>

namespace Imf {

template <typename T>
class Array2D {
  public:
    Array2D() = default;
    Array2D(long h, long w) { resizeErase(h, w); }
    void resizeErase(long h, long w) {
        h_ = h;
        w_ = w;
        data_.assign((size_t)(h * w), T());
    }
    T *operator[](long y) { return data_.data() + (size_t)(y * w_); }
    const T *operator[](long y) const {
        return data_.data() + (size_t)(y * w_);
    }

  private:
    long h_ = 0, w_ = 0;
    std::vector<T> data_;
};

}  // namespace Imf

#endif
