// Golden generator for post-processing parity: builds the reference test
// image (test/test_utils.cpp getTestImage semantics: per-pixel uniform RGBA
// from RandomEngine(seed)), dumps it raw, then dumps toneMap(img) and
// postProcess(img) raws. The tone map is fully deterministic (the
// "gaussian" segment weight is the normal DENSITY at the segment center,
// src/post_processing.cpp:91-103), so parity can be checked tightly.
// Raw format: int32 w, int32 h, then h*w*4 float32 RGBA (y-major).
#include <PathTrace/base.h>
#include <PathTrace/image/image.h>
#include <PathTrace/post_processing.h>

#include <cstdio>
#include <random>

static void dump(const Image<> &img, const char *path) {
    std::FILE *f = std::fopen(path, "wb");
    if (!f) { std::perror("fopen"); std::exit(1); }
    int wh[2] = {img.getWidth(), img.getHeight()};
    std::fwrite(wh, 4, 2, f);
    for (int y = 0; y < img.getHeight(); ++y) {
        for (int x = 0; x < img.getWidth(); ++x) {
            auto c = img(x, y);
            float v[4] = {c[0], c[1], c[2], c[3]};
            std::fwrite(v, 4, 4, f);
        }
    }
    std::fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s in.raw tonemap.raw post.raw\n", argv[0]);
        return 1;
    }
    const int width = 64, height = 48;
    Image<> image(width, height);
    RandomEngine re(1234);
    std::uniform_real_distribution<float> dist(0, 1);
    for (int y = 0; y < height; ++y)
        for (int x = 0; x < width; ++x) {
            float r = dist(re), g = dist(re), b = dist(re), a = dist(re);
            image(x, y) = Color<float>(r, g, b, a);
        }
    dump(image, argv[1]);

    Image<> tm = image;
    toneMap(tm);
    dump(tm, argv[2]);

    Image<> pp = image;
    postProcess(pp);
    dump(pp, argv[3]);
    return 0;
}
