// Shim: the reference includes <opencv2/xfeatures2d.hpp> but uses no
// xfeatures2d:: symbols (SIFT lives in features2d since OpenCV 4.4).
#pragma once
#include <opencv2/features2d.hpp>
