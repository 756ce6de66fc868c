// Golden generator for the ADAPTIVE sampling path (min < max): the panel-lit
// inward box rendered through processJob with min=16 max=64 — engages the
// reference's Welford early-accept rule and biased candidate-batch
// selection per pixel (src/worker.cpp:158-317), the one estimator surface
// the fixed-spp goldens do not exercise. Two output files from two
// independent runs measure the reference's self-agreement (processJob
// seeds its RNG from std::random_device, so goldens are statistical).
// Raw format matches tests/test_parity.py::read_golden.
#include <PathTrace/camera.h>
#include <PathTrace/scene/material.h>
#include <PathTrace/scene/mesh.h>
#include <PathTrace/scene/object.h>
#include <PathTrace/scene/propagation.h>
#include <PathTrace/scene/scene.h>
#include <PathTrace/worker.h>

#include <cstdio>
#include <memory>
#include <vector>

static void dump(const Image<> &img, const char *path) {
    std::FILE *f = std::fopen(path, "wb");
    if (!f) { std::perror("fopen"); std::exit(1); }
    int wh[2] = {img.getWidth(), img.getHeight()};
    std::fwrite(wh, 4, 2, f);
    for (int y = 0; y < img.getHeight(); ++y)
        for (int x = 0; x < img.getWidth(); ++x) {
            auto c = img(x, y);
            float v[4] = {c[0], c[1], c[2], c[3]};
            std::fwrite(v, 4, 4, f);
        }
    std::fclose(f);
}

using ObjVec = std::vector<std::unique_ptr<Object>>;

static void addPlane(ObjVec &objects, vec3<float> a, vec3<float> b,
                     const std::shared_ptr<MaterialHandler> &mh) {
    auto tris = makePlane(a, b, true);
    for (auto &t : tris) t.setMaterialHandler(mh);
    moveObjects(objects, tris);
}

static Image<> renderOnce() {
    auto lamb = std::make_shared<LambertianBRDF>();
    auto white_m = std::make_shared<ConstantMaterial>(Color<float>(1.0F, 1.0F, 1.0F, 1.0F));
    auto white = std::make_shared<ConstantMaterialHandler>(white_m, lamb);
    auto light_m = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.0F,
      Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F)));
    auto light = std::make_shared<ConstantMaterialHandler>(light_m, lamb);

    ObjVec objects;
    std::vector<std::unique_ptr<LightSource>> lights;
    addPlane(objects, {1, -1, -1}, {-1, -1, 1}, white);
    addPlane(objects, {-1, 1, -1}, {1, 1, 1}, white);
    addPlane(objects, {-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F}, light);
    addPlane(objects, {-1, -1, -1}, {1, 1, -1}, white);
    addPlane(objects, {-1, -1, -1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {1, 1, -1}, white);
    Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                  {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F);
    Scene scene(std::move(objects), std::move(lights));
    RenderOptions options{32, 32, 16, 64, 1.0E-3F, false};
    FrameRenderJob job{camera, scene, options};
    return processJob(job);
}

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s out.raw out2.raw\n", argv[0]);
        return 1;
    }
    dump(renderOnce(), argv[1]);
    dump(renderOnce(), argv[2]);
    return 0;
}
