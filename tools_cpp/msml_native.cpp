// Native host-side tools for the msml_tpu input/eval pipelines.
//
// Provides C ABI:
//   * similar_transform_2d — Umeyama least-squares similarity transform
//     (parity with the reference datasets/3d_tools/cpp_align/face_align.h:82-142
//     and eval/preprocess/alignment.py estimate_norm), used for 5-point
//     landmark -> 112x112 face alignment in offline dataset prep.
//   * nms — greedy IoU box suppression (parity with the reference
//     eval/preprocess/PIPNet/FaceBoxesV2/utils/nms/cpu_nms.pyx and its
//     pure-python fallback py_cpu_nms.py), used by detector-based alignment.
//
// No external dependencies: the 2x2 SVD needed by Umeyama is closed-form.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Umeyama 1991 with scale estimation: find T (3x3 row-major, float) such
// that dst ~ s * R @ src + t. src/dst: n x 2 row-major float32.
//
// In 2D the SVD form reduces exactly to the closed-form optimal proper
// rotation: theta = atan2(A21 - A12, A11 + A22) with
// sum_i d_i*sigma_i = trace(R^T A) = hypot(A11 + A22, A21 - A12); the
// Umeyama d-flip for det(A) < 0 is subsumed (R is always the closest proper
// rotation). Degenerate rank cases (collinear landmarks) fall back the same
// way.
int similar_transform_2d(const float* src, const float* dst, int n,
                         float* out /* 3x3 row-major */) {
  if (n < 2) return -1;
  double sm[2] = {0, 0}, dm[2] = {0, 0};
  for (int i = 0; i < n; ++i) {
    sm[0] += src[2 * i]; sm[1] += src[2 * i + 1];
    dm[0] += dst[2 * i]; dm[1] += dst[2 * i + 1];
  }
  sm[0] /= n; sm[1] /= n; dm[0] /= n; dm[1] /= n;

  // covariance A = (dst_demean^T @ src_demean) / n, and src variance
  double A[4] = {0, 0, 0, 0};
  double var_src = 0.0;
  for (int i = 0; i < n; ++i) {
    const double sx = src[2 * i] - sm[0], sy = src[2 * i + 1] - sm[1];
    const double dx = dst[2 * i] - dm[0], dy = dst[2 * i + 1] - dm[1];
    A[0] += dx * sx; A[1] += dx * sy;
    A[2] += dy * sx; A[3] += dy * sy;
    var_src += sx * sx + sy * sy;
  }
  for (int k = 0; k < 4; ++k) A[k] /= n;
  var_src /= n;
  if (var_src <= 0) return -2;

  const double cs = A[0] + A[3];          // trace
  const double sn = A[2] - A[1];          // A21 - A12
  const double norm = std::hypot(cs, sn);
  if (norm <= 0) return -3;
  double R[4];
  R[0] = cs / norm; R[1] = -sn / norm;
  R[2] = sn / norm; R[3] = cs / norm;

  const double scale = norm / var_src;

  const double tx = dm[0] - scale * (R[0] * sm[0] + R[1] * sm[1]);
  const double ty = dm[1] - scale * (R[2] * sm[0] + R[3] * sm[1]);

  out[0] = (float)(scale * R[0]); out[1] = (float)(scale * R[1]);
  out[2] = (float)tx;
  out[3] = (float)(scale * R[2]); out[4] = (float)(scale * R[3]);
  out[5] = (float)ty;
  out[6] = 0.f; out[7] = 0.f; out[8] = 1.f;
  return 0;
}

// Greedy NMS. dets: n x 5 row-major float32 (x1, y1, x2, y2, score).
// keep: out buffer of capacity n; returns number kept.
// Matches py_cpu_nms.py: areas use the +1 convention, suppression is
// strictly "overlap > thresh".
int nms(const float* dets, int n, float thresh, int32_t* keep) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[5 * a + 4] > dets[5 * b + 4];
  });
  std::vector<double> areas(n);
  for (int i = 0; i < n; ++i) {
    areas[i] = (double)(dets[5 * i + 2] - dets[5 * i] + 1) *
               (double)(dets[5 * i + 3] - dets[5 * i + 1] + 1);
  }
  std::vector<char> suppressed(n, 0);
  int n_keep = 0;
  for (size_t oi = 0; oi < order.size(); ++oi) {
    const int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int j = order[oj];
      if (suppressed[j]) continue;
      const float xx1 = std::max(dets[5 * i], dets[5 * j]);
      const float yy1 = std::max(dets[5 * i + 1], dets[5 * j + 1]);
      const float xx2 = std::min(dets[5 * i + 2], dets[5 * j + 2]);
      const float yy2 = std::min(dets[5 * i + 3], dets[5 * j + 3]);
      const double w = std::max(0.f, xx2 - xx1 + 1);
      const double h = std::max(0.f, yy2 - yy1 + 1);
      const double inter = w * h;
      const double ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Bounding-box IoU matrix (RetinaFace rcnn/cython/bbox.pyx parity):
// boxes: n x 4, query: k x 4, out: n x k row-major.
void bbox_overlaps(const float* boxes, int n, const float* query, int k,
                   float* out) {
  for (int j = 0; j < k; ++j) {
    const double qa = (double)(query[4 * j + 2] - query[4 * j] + 1) *
                      (double)(query[4 * j + 3] - query[4 * j + 1] + 1);
    for (int i = 0; i < n; ++i) {
      const double iw = std::min(boxes[4 * i + 2], query[4 * j + 2]) -
                        std::max(boxes[4 * i], query[4 * j]) + 1;
      double v = 0.0;
      if (iw > 0) {
        const double ih = std::min(boxes[4 * i + 3], query[4 * j + 3]) -
                          std::max(boxes[4 * i + 1], query[4 * j + 1]) + 1;
        if (ih > 0) {
          const double ua =
              (double)(boxes[4 * i + 2] - boxes[4 * i] + 1) *
                  (double)(boxes[4 * i + 3] - boxes[4 * i + 1] + 1) +
              qa - iw * ih;
          v = iw * ih / ua;
        }
      }
      out[(size_t)i * k + j] = (float)v;
    }
  }
}

// COCO-style RLE mask encode/decode (capability parity with the reference's
// vendored pycocotools maskApi.c used by the RetinaFace benchmark tooling).
// Column-major (Fortran) order like COCO; counts alternate zeros/ones
// starting with zeros.
// encode: mask (h*w uint8, column-major) -> counts buffer; returns n_counts
// (caller provides counts capacity h*w+1).
int rle_encode(const uint8_t* mask, int h, int w, uint32_t* counts) {
  const long n = (long)h * w;
  int n_counts = 0;
  uint8_t cur = 0;  // runs start with zeros
  uint32_t run = 0;
  for (long i = 0; i < n; ++i) {
    const uint8_t v = mask[i] ? 1 : 0;
    if (v != cur) {
      counts[n_counts++] = run;
      run = 0;
      cur = v;
    }
    ++run;
  }
  counts[n_counts++] = run;
  return n_counts;
}

// decode: counts -> mask (h*w uint8, column-major order buffer).
void rle_decode(const uint32_t* counts, int n_counts, int h, int w,
                uint8_t* mask) {
  long pos = 0;
  const long n = (long)h * w;
  uint8_t cur = 0;
  for (int c = 0; c < n_counts && pos < n; ++c) {
    const long end = pos + counts[c];
    for (; pos < end && pos < n; ++pos) mask[pos] = cur;
    cur = 1 - cur;
  }
}

// RLE area (sum of the one-runs).
long rle_area(const uint32_t* counts, int n_counts) {
  long area = 0;
  for (int c = 1; c < n_counts; c += 2) area += counts[c];
  return area;
}

}  // extern "C"
