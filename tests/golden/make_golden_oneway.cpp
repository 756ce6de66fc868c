// Golden generator for the ONE-WAY mirror BSDF (MirrorBRDF(one_way=true),
// src/scene/propagation.cpp:184-204): a tinted one-way mirror pane inside
// the panel-lit inward box — rays hitting its back face pass through with
// factor 1, front-face hits reflect scaled by the specular tint. No other
// golden exercises the pass-through branch. Raw format matches
// tests/test_parity.py::read_golden.
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

class TintedMaterial final : public Material {
    Color<float> diffuse;
    Color<float> specular;
    float ior;

  public:
    TintedMaterial(Color<float> d, Color<float> s, float ri) noexcept
      : diffuse(d), specular(s), ior(ri) {}
    Color<float> getDiffuseColor(vec3<float>) const noexcept override { return diffuse; }
    Color<float> getSpecularColor(vec3<float>) const noexcept override { return specular; }
    float getRefractiveIndex(vec3<float>) const noexcept override { return ior; }
};

static void addPlane(ObjVec &objects, vec3<float> a, vec3<float> b,
                     const std::shared_ptr<MaterialHandler> &mh) {
    auto tris = makePlane(a, b, true);
    for (auto &t : tris) t.setMaterialHandler(mh);
    moveObjects(objects, tris);
}

int main(int argc, char **argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s out.raw\n", argv[0]);
        return 1;
    }
    const int size = 32;
    const int spp = 512;
    auto lamb = std::make_shared<LambertianBRDF>();
    auto white_m = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F));
    auto white = std::make_shared<ConstantMaterialHandler>(white_m, lamb);
    auto light_m = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.0F,
      Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F)));
    auto light = std::make_shared<ConstantMaterialHandler>(light_m, lamb);
    // Tinted one-way mirror: diffuse white, specular (1, 0.35, 0.35).
    // ConstantMaterial has no specular tint (getSpecularColor defaults to
    // white, src/scene/material.cpp:15-17), so implement Material directly.
    auto mir_m = std::make_shared<TintedMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F),
      Color<float>(1.0F, 0.35F, 0.35F, 1.0F), 1.0F);
    auto oneway = std::make_shared<ConstantMaterialHandler>(
      mir_m, std::make_shared<MirrorBRDF>(true));

    ObjVec objects;
    std::vector<std::unique_ptr<LightSource>> lights;
    addPlane(objects, {1, -1, -1}, {-1, -1, 1}, white);
    addPlane(objects, {-1, 1, -1}, {1, 1, 1}, white);
    addPlane(objects, {-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F}, light);
    addPlane(objects, {-1, -1, -1}, {1, 1, -1}, white);
    addPlane(objects, {-1, -1, -1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {1, 1, -1}, white);
    // The one-way pane: a z=0.3 rectangle covering the image center.
    // (Winding as makePlane emits it; both implementations share it.)
    auto pane = makePlane({-0.6F, -0.6F, 0.3F}, {0.6F, 0.6F, 0.3F}, false);
    for (auto &t : pane) t.setMaterialHandler(oneway);
    moveObjects(objects, pane);

    Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                  {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F);
    Scene scene(std::move(objects), std::move(lights));
    RenderOptions options{size, size, spp, spp, 1.0E-3F, false};
    FrameRenderJob job{camera, scene, options};
    auto img = processJob(job);
    dump(img, argv[1]);
    return 0;
}
