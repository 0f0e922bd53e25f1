// Definitions for the glog shim flags + ptex factory stubs.
#include <string>

int FLAGS_stderrthreshold = 2;
int FLAGS_minloglevel = 0;
int FLAGS_v = 0;
bool FLAGS_logtostderr = false;
std::string FLAGS_log_dir;

// ptex stubs: the vendored ptex library is absent; scenes using
// Texture "ptex" abort with a clear error instead.
#include "pbrt.h"
#include "textures/ptex.h"
#include "error.h"

namespace pbrt {

PtexTexture<Float> *CreatePtexFloatTexture(const Transform &,
                                           const TextureParams &) {
    Error("ptex textures are not available in this build");
    return nullptr;
}

PtexTexture<Spectrum> *CreatePtexSpectrumTexture(const Transform &,
                                                 const TextureParams &) {
    Error("ptex textures are not available in this build");
    return nullptr;
}

}  // namespace pbrt
