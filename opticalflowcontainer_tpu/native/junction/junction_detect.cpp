// Fishnet junction-point detector (host-side C++ / OpenCV).
//
// Capability-equivalent of the reference's junction_point_detector C++ node
// (reference junction_detector.cpp:3-214): suppress the non-net background
// with a red-vs-blue weighting, adaptively threshold the mesh, find contours,
// keep grid-cell-sized boxes, emit their corners as junction candidates and
// cluster nearby candidates into junction points.  Clustering here is a
// uniform-grid hash radius search (own design; the reference vendored a
// KD-tree library for the same job).
//
// Exposed as a small extern "C" API for ctypes (no pybind11 in this
// toolchain).

#include <opencv2/imgproc.hpp>
#include <opencv2/core.hpp>
#include <cmath>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

// Down-weight pixels whose red-minus-blue is outside [lo, hi]: underwater
// background is blue-heavy (r - b very negative), net twine sits in a narrow
// band.  Soft ramp instead of the reference's hard per-pixel adjustment.
cv::Mat suppress_background(const cv::Mat& bgr, float lo, float hi) {
  cv::Mat gray(bgr.rows, bgr.cols, CV_8UC1);
  const float span = std::max(hi - lo, 1.0f);
  for (int y = 0; y < bgr.rows; ++y) {
    const cv::Vec3b* row = bgr.ptr<cv::Vec3b>(y);
    uint8_t* g = gray.ptr<uint8_t>(y);
    for (int x = 0; x < bgr.cols; ++x) {
      const float b = row[x][0], gg = row[x][1], r = row[x][2];
      const float rb = r - b;
      float w = 1.0f;
      if (rb < lo) w = std::max(0.0f, 1.0f + (rb - lo) / span);
      const float lum = 0.114f * b + 0.587f * gg + 0.299f * r;
      g[x] = static_cast<uint8_t>(std::min(255.0f, lum * w));
    }
  }
  return gray;
}

struct Candidate {
  float x, y;
};

// Uniform-grid radius clustering: candidates within `eps` of each other merge;
// clusters with >= min_pts members become junctions (their centroid).
std::vector<Candidate> cluster(const std::vector<Candidate>& pts, float eps,
                               int min_pts) {
  const float cell = eps;
  std::unordered_map<int64_t, std::vector<int>> grid;
  auto key = [cell](float x, float y) {
    return (static_cast<int64_t>(std::floor(x / cell)) << 32) ^
           (static_cast<int64_t>(std::floor(y / cell)) & 0xffffffff);
  };
  for (size_t i = 0; i < pts.size(); ++i)
    grid[key(pts[i].x, pts[i].y)].push_back(static_cast<int>(i));

  std::vector<int> label(pts.size(), -1);
  int n_clusters = 0;
  std::vector<int> stack;
  for (size_t seed = 0; seed < pts.size(); ++seed) {
    if (label[seed] != -1) continue;
    label[seed] = n_clusters;
    stack.assign(1, static_cast<int>(seed));
    while (!stack.empty()) {
      const int i = stack.back();
      stack.pop_back();
      const int cx = static_cast<int>(std::floor(pts[i].x / cell));
      const int cy = static_cast<int>(std::floor(pts[i].y / cell));
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          const int64_t k = (static_cast<int64_t>(cx + dx) << 32) ^
                            (static_cast<int64_t>(cy + dy) & 0xffffffff);
          auto it = grid.find(k);
          if (it == grid.end()) continue;
          for (int j : it->second) {
            if (label[j] != -1) continue;
            const float ddx = pts[i].x - pts[j].x, ddy = pts[i].y - pts[j].y;
            if (ddx * ddx + ddy * ddy <= eps * eps) {
              label[j] = n_clusters;
              stack.push_back(j);
            }
          }
        }
    }
    ++n_clusters;
  }

  std::vector<int> count(n_clusters, 0);
  std::vector<Candidate> sum(n_clusters, {0.f, 0.f});
  for (size_t i = 0; i < pts.size(); ++i) {
    ++count[label[i]];
    sum[label[i]].x += pts[i].x;
    sum[label[i]].y += pts[i].y;
  }
  std::vector<Candidate> out;
  for (int c = 0; c < n_clusters; ++c)
    if (count[c] >= min_pts)
      out.push_back({sum[c].x / count[c], sum[c].y / count[c]});
  return out;
}

}  // namespace

extern "C" {

// Detect junction points in a bgr8 image.  Writes up to max_out (x, y) pairs
// into out_xy; returns the number of junctions found (>= 0) or -1 on error.
// ``rotated`` != 0 uses minAreaRect cells (the reference test-harness variant
// for nets seen at an angle — reference junction_point_tests/
// junction_detector.cpp:126-170); 0 uses axis-aligned bounding boxes (the
// reference ROS-node variant).
int ofc_detect_junctions(const uint8_t* bgr_data, int height, int width,
                         float grid_area, float area_tol, float cluster_eps,
                         int min_cluster_pts, float rb_lo, float rb_hi,
                         int rotated, float* out_xy, int max_out) {
  if (!bgr_data || height <= 2 || width <= 2 || !out_xy || max_out <= 0)
    return -1;
  try {
    const cv::Mat bgr(height, width, CV_8UC3, const_cast<uint8_t*>(bgr_data));
    cv::Mat gray = suppress_background(bgr, rb_lo, rb_hi);
    cv::Mat blurred, bin;
    cv::GaussianBlur(gray, blurred, cv::Size(3, 3), 0);
    cv::adaptiveThreshold(blurred, bin, 255, cv::ADAPTIVE_THRESH_GAUSSIAN_C,
                          cv::THRESH_BINARY_INV, 11, 2.0);

    std::vector<std::vector<cv::Point>> contours;
    cv::findContours(bin, contours, cv::RETR_TREE, cv::CHAIN_APPROX_SIMPLE);

    std::vector<Candidate> cands;
    const float amin = grid_area / area_tol, amax = grid_area * area_tol;
    for (const auto& c : contours) {
      const double area = cv::contourArea(c);
      if (area < amin || area > amax) continue;
      if (rotated) {
        const cv::RotatedRect rect = cv::minAreaRect(c);
        float rw = rect.size.width, rh = rect.size.height;
        if (rect.angle < -45.0f) std::swap(rw, rh);
        if (rw <= 0 || rh <= 0) continue;
        const float solidity = static_cast<float>(area) / (rw * rh);
        const float aspect = rw / rh;
        if (solidity < 0.4f || aspect < 0.5f || aspect > 2.0f) continue;
        cv::Point2f vertices[4];
        rect.points(vertices);
        for (const auto& vtx : vertices) cands.push_back({vtx.x, vtx.y});
        continue;
      }
      const cv::Rect box = cv::boundingRect(c);
      if (box.width <= 0 || box.height <= 0) continue;
      const float solidity =
          static_cast<float>(area) / (box.width * box.height);
      const float aspect = static_cast<float>(box.width) / box.height;
      if (solidity < 0.4f || aspect < 0.5f || aspect > 2.0f) continue;
      // the 4 cell corners are junction candidates shared with neighbors
      cands.push_back({(float)box.x, (float)box.y});
      cands.push_back({(float)(box.x + box.width), (float)box.y});
      cands.push_back({(float)box.x, (float)(box.y + box.height)});
      cands.push_back({(float)(box.x + box.width), (float)(box.y + box.height)});
    }

    const auto junctions = cluster(cands, cluster_eps, min_cluster_pts);
    const int n = std::min<int>(junctions.size(), max_out);
    for (int i = 0; i < n; ++i) {
      out_xy[2 * i] = junctions[i].x;
      out_xy[2 * i + 1] = junctions[i].y;
    }
    return n;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
