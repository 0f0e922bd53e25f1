// Minimal glog-compatible shim for building the reference renderer without
// the vendored glog submodule. Implements the macro/API surface pbrt uses:
// LOG/VLOG/LOG_IF/CHECK/CHECK_op/DCHECK*/CHECK_NOTNULL, the FLAGS_* globals
// main/pbrt.cpp sets, and google::InitGoogleLogging. INFO is discarded
// (real glog writes it to a log file); WARNING+ go to stderr; FATAL aborts.
#ifndef SHIM_GLOG_LOGGING_H
#define SHIM_GLOG_LOGGING_H

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

extern int FLAGS_stderrthreshold;
extern int FLAGS_minloglevel;
extern int FLAGS_v;
extern bool FLAGS_logtostderr;
extern std::string FLAGS_log_dir;

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
}  // namespace google

namespace shimlog {

struct Msg {
    int sev;      // 0 INFO, 1 WARNING, 2 ERROR, 3 FATAL; -1 = discarded
    bool on;
    std::ostringstream ss;
    explicit Msg(int s) : sev(s) {
        on = (s >= 0) && (s >= FLAGS_minloglevel) &&
             (s >= FLAGS_stderrthreshold || FLAGS_logtostderr || s >= 3);
    }
    template <typename T>
    Msg &operator<<(const T &v) {
        if (on) ss << v;
        return *this;
    }
    Msg &operator<<(std::ostream &(*manip)(std::ostream &)) {
        if (on) ss << manip;
        return *this;
    }
    ~Msg() {
        if (on) {
            static const char *tag[] = {"I", "W", "E", "F"};
            std::cerr << tag[sev < 0 ? 0 : (sev > 3 ? 3 : sev)] << " "
                      << ss.str() << std::endl;
        }
        if (sev >= 3) std::abort();
    }
};

struct Voidify {
    void operator&(Msg &) {}
    void operator&(Msg &&) {}
};

}  // namespace shimlog

#define SHIM_LOG_INFO ::shimlog::Msg(0)
#define SHIM_LOG_WARNING ::shimlog::Msg(1)
#define SHIM_LOG_ERROR ::shimlog::Msg(2)
#define SHIM_LOG_FATAL ::shimlog::Msg(3)
#define LOG(severity) SHIM_LOG_##severity
#define LOG_IF(severity, cond) \
    ::shimlog::Msg((cond) ? SHIM_SEV_##severity : -1)
#define SHIM_SEV_INFO 0
#define SHIM_SEV_WARNING 1
#define SHIM_SEV_ERROR 2
#define SHIM_SEV_FATAL 3
#define VLOG(n) ::shimlog::Msg(((n) <= FLAGS_v) ? 0 : -1)
#define VLOG_IF(n, cond) \
    ::shimlog::Msg((((n) <= FLAGS_v) && (cond)) ? 0 : -1)

#define SHIM_CHECK_IMPL(cond, text)                                  \
    (cond) ? (void)0                                                 \
           : ::shimlog::Voidify() &                                  \
                 (::shimlog::Msg(3) << "Check failed: " << text << " ")
#define CHECK(c) SHIM_CHECK_IMPL((c), #c)
#define CHECK_EQ(a, b) SHIM_CHECK_IMPL((a) == (b), #a " == " #b)
#define CHECK_NE(a, b) SHIM_CHECK_IMPL((a) != (b), #a " != " #b)
#define CHECK_LT(a, b) SHIM_CHECK_IMPL((a) < (b), #a " < " #b)
#define CHECK_LE(a, b) SHIM_CHECK_IMPL((a) <= (b), #a " <= " #b)
#define CHECK_GT(a, b) SHIM_CHECK_IMPL((a) > (b), #a " > " #b)
#define CHECK_GE(a, b) SHIM_CHECK_IMPL((a) >= (b), #a " >= " #b)

#ifdef NDEBUG
#define SHIM_DCHECK_IMPL(cond) SHIM_CHECK_IMPL(true, "")
#else
#define SHIM_DCHECK_IMPL(cond) SHIM_CHECK_IMPL((cond), #cond)
#endif
#define DCHECK(c) SHIM_DCHECK_IMPL(c)
#define DCHECK_EQ(a, b) SHIM_DCHECK_IMPL((a) == (b))
#define DCHECK_NE(a, b) SHIM_DCHECK_IMPL((a) != (b))
#define DCHECK_LT(a, b) SHIM_DCHECK_IMPL((a) < (b))
#define DCHECK_LE(a, b) SHIM_DCHECK_IMPL((a) <= (b))
#define DCHECK_GT(a, b) SHIM_DCHECK_IMPL((a) > (b))
#define DCHECK_GE(a, b) SHIM_DCHECK_IMPL((a) >= (b))

namespace shimlog {
template <typename T>
T *CheckNotNull(T *p, const char *text) {
    if (p == nullptr) { Msg(3) << "Check failed (null): " << text; }
    return p;
}
}  // namespace shimlog
#define CHECK_NOTNULL(p) ::shimlog::CheckNotNull((p), #p)

#endif  // SHIM_GLOG_LOGGING_H
