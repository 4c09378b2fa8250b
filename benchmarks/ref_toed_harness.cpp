// Ground-truth TOED oracle harness: compiles the REFERENCE detector
// (/root/reference/src/toed/cpu_toed.cpp, linked as a separate TU via the
// cv_shim headers) and runs it on a P5 PGM image, dumping the edge list.
//
// Usage: ref_toed_harness <image.pgm>
// Output: one line per edge: "x y orientation" (max double precision),
// preceded by a count line. tests/test_toed_ref_parity.py builds this
// with:
//   g++ -O2 -fopenmp -Ibenchmarks/cv_shim -I/root/reference/src \
//       benchmarks/ref_toed_harness.cpp /root/reference/src/toed/cpu_toed.cpp
// (quoted-include fallback resolves the reference's ../include/ paths.)

#include <cstdio>
#include <cstdlib>
#include <string>

#include <opencv2/opencv.hpp>  // the shim

#include "toed/cpu_toed.hpp"   // reference header (-I/root/reference/include)

static bool read_pgm(const char *path, cv::Mat &out) {
  FILE *f = std::fopen(path, "rb");
  if (!f) return false;
  char magic[3] = {0};
  if (std::fscanf(f, "%2s", magic) != 1 || std::string(magic) != "P5") {
    std::fclose(f);
    return false;
  }
  int vals[3], got = 0;
  while (got < 3) {
    int c = std::fgetc(f);
    if (c == '#') {  // comment line
      while (c != '\n' && c != EOF) c = std::fgetc(f);
    } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      continue;
    } else {
      std::ungetc(c, f);
      if (std::fscanf(f, "%d", &vals[got]) != 1) {
        std::fclose(f);
        return false;
      }
      ++got;
    }
  }
  std::fgetc(f);  // single whitespace after maxval
  int w = vals[0], h = vals[1];
  out = cv::Mat(h, w);
  size_t n = static_cast<size_t>(w) * h;
  if (std::fread(out.buf.data(), 1, n, f) != n) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);
  return true;
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <image.pgm>\n", argv[0]);
    return 2;
  }
  cv::Mat img;
  if (!read_pgm(argv[1], img)) {
    std::fprintf(stderr, "failed to read %s\n", argv[1]);
    return 2;
  }
  ThirdOrderEdgeDetectionCPU toed(img.rows, img.cols);
  toed.get_Third_Order_Edges(img);
  std::printf("%zu\n", toed.toed_edges.size());
  for (const Edge &e : toed.toed_edges) {
    std::printf("%.17g %.17g %.17g\n", e.location.x, e.location.y,
                e.orientation);
  }
  return 0;
}
