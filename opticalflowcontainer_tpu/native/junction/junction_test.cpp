// Standalone harness for the junction detector (the reference keeps a similar
// non-ROS visual test bench under scripts/junction_point_tests/).
//
// With an image path: runs detection and prints the junctions.
// Without: generates a synthetic fishnet grid, runs detection, and checks the
// recovered junction count/positions — exit 0 on success.

#include <opencv2/imgproc.hpp>
#include <opencv2/imgcodecs.hpp>
#include <cstdio>
#include <vector>

extern "C" int ofc_detect_junctions(const unsigned char*, int, int, float,
                                    float, float, int, float, float, int,
                                    float*, int);

int main(int argc, char** argv) {
  cv::Mat img;
  int cell = 24;
  if (argc > 1) {
    img = cv::imread(argv[1]);
    if (img.empty()) {
      std::fprintf(stderr, "cannot read %s\n", argv[1]);
      return 2;
    }
  } else {
    // synthetic net: dark twine grid on blue water
    img = cv::Mat(240, 320, CV_8UC3, cv::Scalar(180, 120, 60));  // blue-ish
    for (int y = 12; y < img.rows; y += cell)
      cv::line(img, {0, y}, {img.cols, y}, cv::Scalar(30, 40, 50), 2);
    for (int x = 12; x < img.cols; x += cell)
      cv::line(img, {x, 0}, {x, img.rows}, cv::Scalar(30, 40, 50), 2);
  }

  std::vector<float> out(2 * 4096);
  const float grid_area = static_cast<float>((cell - 2) * (cell - 2));
  const int n = ofc_detect_junctions(img.data, img.rows, img.cols, grid_area,
                                     2.0f, 6.0f, 3, -20.0f, 15.0f, 0,
                                     out.data(), 4096);
  std::printf("junctions: %d\n", n);
  for (int i = 0; i < std::min(n, 8); ++i)
    std::printf("  (%.1f, %.1f)\n", out[2 * i], out[2 * i + 1]);

  if (argc > 1) return n >= 0 ? 0 : 1;

  // synthetic grid: expect roughly (cols/cell - 1) * (rows/cell - 1) interior
  // junctions; accept a generous band
  const int expect = (img.cols / cell - 1) * (img.rows / cell - 1);
  const bool ok = n > expect / 2 && n < expect * 2;
  std::printf("expected ~%d -> %s\n", expect, ok ? "OK" : "FAIL");
  return ok ? 0 : 1;
}
