// Golden-image generator: renders tests/scenes_util.py::specular_box_scene
// through the reference library (processJob) and dumps the raw float image.
// Output format matches tests/test_parity.py::read_golden:
//   int32 w, int32 h, then h*w*4 float32 RGBA (y-major).
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

// The reference's ConstantMaterial has no specular tint (getSpecularColor
// defaults to white, src/scene/material.cpp:15-17); the Material interface
// does. specular_box_scene uses tinted mirrors/glass, so implement the
// interface directly.
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

int main(int argc, char **argv) {
    const int size = 32;
    const int spp = 512;
    if (argc < 2) { std::fprintf(stderr, "usage: %s out.raw\n", argv[0]); return 1; }

    Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F}, {0.0F, 1.0F, 0.0F},
                  1.0F, 1.0F, 1.0F);

    std::vector<std::unique_ptr<Object>> objects;
    std::vector<std::unique_ptr<LightSource>> lights;
    auto lamb = std::make_shared<LambertianBRDF>();

    auto add_plane = [&](vec3<float> a, vec3<float> b,
                         const std::shared_ptr<MaterialHandler> &mh) {
        auto tris = makePlane(a, b, true);
        for (auto &t : tris) t.setMaterialHandler(mh);
        moveObjects(objects, tris);
    };

    auto white_m = std::make_shared<ConstantMaterial>(Color<float>(1, 1, 1, 1));
    auto white = std::make_shared<ConstantMaterialHandler>(white_m, lamb);
    auto light_m = std::make_shared<ConstantMaterial>(
      Color<float>(1, 1, 1, 1), 1.0F, Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F)));
    auto light = std::make_shared<ConstantMaterialHandler>(light_m, lamb);

    // Exact corner orders of tests/scenes_util.py::specular_box_scene.
    add_plane({1, -1, -1}, {-1, -1, 1}, white);
    add_plane({-1, 1, -1}, {1, 1, 1}, white);
    add_plane({-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F}, light);
    add_plane({-1, -1, -1}, {1, 1, -1}, white);
    add_plane({-1, -1, -1}, {-1, 1, 1}, white);
    add_plane({1, -1, 1}, {-1, 1, 1}, white);
    add_plane({1, -1, 1}, {1, 1, -1}, white);

    {
        auto m = std::make_shared<TintedMaterial>(
          Color<float>(0, 0, 1, 1), Color<float>(0.2F, 0.4F, 0.9F, 1.0F), 1.0F);
        auto mh = std::make_shared<ConstantMaterialHandler>(
          m, std::make_shared<MirrorBRDF>(false));
        auto s = std::make_unique<Sphere>(vec3<float>(-0.4F, -0.3F, 0.5F), 0.4F);
        s->setMaterialHandler(mh);
        objects.emplace_back(std::move(s));
    }
    {
        auto m = std::make_shared<TintedMaterial>(
          Color<float>(1, 1, 1, 1), Color<float>(0.9F, 0.6F, 0.3F, 1.0F), 1.5F);
        auto mh = std::make_shared<ConstantMaterialHandler>(
          m, std::make_shared<GlassBDF>());
        auto s = std::make_unique<Sphere>(vec3<float>(0.45F, -0.35F, 0.45F), 0.35F);
        s->setMaterialHandler(mh);
        objects.emplace_back(std::move(s));
    }

    Scene scene(std::move(objects), std::move(lights));
    RenderOptions options{size, size, spp, spp, 1.0E-3F, false};
    FrameRenderJob job{camera, scene, options};
    auto img = processJob(job);

    std::FILE *f = std::fopen(argv[1], "wb");
    if (!f) { std::perror("fopen"); return 1; }
    int wh[2] = {size, size};
    std::fwrite(wh, 4, 2, f);
    for (int y = 0; y < size; ++y) {
        for (int x = 0; x < size; ++x) {
            auto c = img(x, y);
            float v[4] = {c.r(), c.g(), c.b(), c.a()};
            std::fwrite(v, 4, 4, f);
        }
    }
    std::fclose(f);
    return 0;
}
