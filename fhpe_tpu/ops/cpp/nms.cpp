// Native NMS kernels (box IoU and keypoint OKS), C ABI for ctypes.
//
// TPU-native-framework counterpart of the reference's Cython/CUDA
// extensions (lib/nms/cpu_nms.pyx, lib/nms/nms_kernel.cu): same greedy
// keep-list semantics, implemented fresh in portable C++.  The box variant
// uses the (x2-x1+1) pixel-area convention of the reference; the OKS
// variant mirrors ops/nms.py::oks_nms (which itself matches
// lib/nms/nms.py:97-124).
//
// Build: make -C fhpe_tpu/ops/cpp   (produces libfhpe_nms.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

namespace {

struct ScoreOrder {
    // Tie-break matches numpy argsort()[::-1]: equal scores come out in
    // DECREASING index order (ascending stable sort, then reversed).
    template <typename T>
    static std::vector<int64_t> argsort_desc(const T* scores, int64_t n) {
        std::vector<int64_t> order(n);
        std::iota(order.begin(), order.end(), 0);
        std::stable_sort(order.begin(), order.end(),
                         [scores](int64_t a, int64_t b) {
                             if (scores[a] != scores[b])
                                 return scores[a] > scores[b];
                             return a > b;
                         });
        return order;
    }
};

}  // namespace

extern "C" {

// Greedy box IoU NMS.
// dets: n x 5 [x1, y1, x2, y2, score] row-major float32.
// keep_out: caller-allocated n int64 slots.  Returns number kept.
int64_t fhpe_box_nms(const float* dets, int64_t n, float thresh,
                     int64_t* keep_out) {
    if (n <= 0) return 0;
    std::vector<float> areas(n);
    std::vector<float> scores(n);
    for (int64_t i = 0; i < n; ++i) {
        const float* d = dets + i * 5;
        areas[i] = (d[2] - d[0] + 1.f) * (d[3] - d[1] + 1.f);
        scores[i] = d[4];
    }
    std::vector<int64_t> order = ScoreOrder::argsort_desc(scores.data(), n);
    std::vector<uint8_t> suppressed(n, 0);

    int64_t kept = 0;
    for (int64_t oi = 0; oi < n; ++oi) {
        int64_t i = order[oi];
        if (suppressed[i]) continue;
        keep_out[kept++] = i;
        const float* di = dets + i * 5;
        for (int64_t oj = oi + 1; oj < n; ++oj) {
            int64_t j = order[oj];
            if (suppressed[j]) continue;
            const float* dj = dets + j * 5;
            float xx1 = std::max(di[0], dj[0]);
            float yy1 = std::max(di[1], dj[1]);
            float xx2 = std::min(di[2], dj[2]);
            float yy2 = std::min(di[3], dj[3]);
            float w = std::max(0.f, xx2 - xx1 + 1.f);
            float h = std::max(0.f, yy2 - yy1 + 1.f);
            float inter = w * h;
            float ovr = inter / (areas[i] + areas[j] - inter);
            if (ovr > thresh) suppressed[j] = 1;
        }
    }
    return kept;
}

// Greedy OKS NMS over keypoint detections.
// kpts: n x (3*num_joints) [x, y, v]*J row-major float64.
// scores: n float64.  areas: n float64.  sigmas: num_joints float64.
// keep_out: caller-allocated n int64 slots.  Returns number kept.
int64_t fhpe_oks_nms(const double* kpts, const double* scores,
                     const double* areas, int64_t n, int64_t num_joints,
                     const double* sigmas, double thresh, int64_t* keep_out) {
    if (n <= 0) return 0;
    std::vector<double> vars(num_joints);
    for (int64_t j = 0; j < num_joints; ++j) {
        double s = sigmas[j] * 2.0;
        vars[j] = s * s;
    }
    // sort the doubles directly: a float32 round-trip can reorder
    // near-tied rescored detections vs the numpy oracle
    std::vector<int64_t> order = ScoreOrder::argsort_desc(scores, n);
    std::vector<uint8_t> suppressed(n, 0);
    const double eps = 2.220446049250313e-16;  // np.spacing(1)

    int64_t kept = 0;
    for (int64_t oi = 0; oi < n; ++oi) {
        int64_t i = order[oi];
        if (suppressed[i]) continue;
        keep_out[kept++] = i;
        const double* gi = kpts + i * 3 * num_joints;
        for (int64_t oj = oi + 1; oj < n; ++oj) {
            int64_t j = order[oj];
            if (suppressed[j]) continue;
            const double* gj = kpts + j * 3 * num_joints;
            double sum = 0.0;
            for (int64_t k = 0; k < num_joints; ++k) {
                double dx = gj[3 * k] - gi[3 * k];
                double dy = gj[3 * k + 1] - gi[3 * k + 1];
                double e = (dx * dx + dy * dy) / vars[k]
                           / ((areas[i] + areas[j]) / 2.0 + eps) / 2.0;
                sum += std::exp(-e);
            }
            double oks = sum / (double)num_joints;
            if (oks > thresh) suppressed[j] = 1;
        }
    }
    return kept;
}

// Soft OKS NMS with gaussian rescoring (semantics of ops/nms.py
// soft_oks_nms, itself matching lib/nms/nms.py:138-177): pop the current
// max, rescore the remainder by exp(-oks^2/thresh), re-sort, repeat up to
// max_dets.  Returns number kept; keep_out gets original indices.
int64_t fhpe_soft_oks_nms(const double* kpts, const double* scores_in,
                          const double* areas, int64_t n, int64_t num_joints,
                          const double* sigmas, double thresh,
                          int64_t max_dets, int64_t* keep_out) {
    if (n <= 0) return 0;
    std::vector<double> vars(num_joints);
    for (int64_t j = 0; j < num_joints; ++j) {
        double s = sigmas[j] * 2.0;
        vars[j] = s * s;
    }
    const double eps = 2.220446049250313e-16;  // np.spacing(1)

    std::vector<int64_t> order = ScoreOrder::argsort_desc(scores_in, n);
    std::vector<double> scores(n);
    for (int64_t i = 0; i < n; ++i) scores[i] = scores_in[order[i]];

    int64_t kept = 0;
    while (!order.empty() && kept < max_dets) {
        int64_t i = order[0];
        const double* gi = kpts + i * 3 * num_joints;
        // rescore the tail by OKS vs i
        std::vector<double> new_scores(order.size() - 1);
        std::vector<int64_t> tail(order.begin() + 1, order.end());
        for (size_t t = 0; t < tail.size(); ++t) {
            const double* gj = kpts + tail[t] * 3 * num_joints;
            double sum = 0.0;
            for (int64_t k = 0; k < num_joints; ++k) {
                double dx = gj[3 * k] - gi[3 * k];
                double dy = gj[3 * k + 1] - gi[3 * k + 1];
                double e = (dx * dx + dy * dy) / vars[k]
                           / ((areas[i] + areas[tail[t]]) / 2.0 + eps) / 2.0;
                sum += std::exp(-e);
            }
            double oks = sum / (double)num_joints;
            new_scores[t] = scores[t + 1] * std::exp(-(oks * oks) / thresh);
        }
        // stable re-sort of the tail by the rescored values, numpy tie-break
        std::vector<size_t> perm(tail.size());
        std::iota(perm.begin(), perm.end(), 0);
        std::stable_sort(perm.begin(), perm.end(),
                         [&new_scores](size_t a, size_t b) {
                             if (new_scores[a] != new_scores[b])
                                 return new_scores[a] > new_scores[b];
                             return a > b;
                         });
        std::vector<int64_t> next_order(tail.size());
        std::vector<double> next_scores(tail.size());
        for (size_t t = 0; t < tail.size(); ++t) {
            next_order[t] = tail[perm[t]];
            next_scores[t] = new_scores[perm[t]];
        }
        order = std::move(next_order);
        scores = std::move(next_scores);
        keep_out[kept++] = i;
    }
    return kept;
}

}  // extern "C"
