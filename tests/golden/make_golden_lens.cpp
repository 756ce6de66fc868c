// Golden generators for two integration paths no render golden covers:
//  (a) thin lens + circular aperture over the inward box (camera.cpp:78-113
//      aperture/lens path, incl. the up/right offset quirk at camera.cpp:99)
//  (b) an emissive SPHERE as the only light (sphere area-light registration,
//      power CDF, uniform-sphere surface sampling and the area->solid-angle
//      pdf conversion, scene.cpp:183-289 + object.cpp:101-116)
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

// The 7 inward-wound walls of tests/scenes_util.py (demo corner orders).
static void addBox(ObjVec &objects, const std::shared_ptr<MaterialHandler> &white,
                   const std::shared_ptr<MaterialHandler> &light, bool with_panel) {
    addPlane(objects, {1, -1, -1}, {-1, -1, 1}, white);
    addPlane(objects, {-1, 1, -1}, {1, 1, 1}, white);
    if (with_panel)
        addPlane(objects, {-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F}, light);
    addPlane(objects, {-1, -1, -1}, {1, 1, -1}, white);
    addPlane(objects, {-1, -1, -1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {-1, 1, 1}, white);
    addPlane(objects, {1, -1, 1}, {1, 1, -1}, white);
}

int main(int argc, char **argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s lens.raw emsphere.raw hex.raw\n",
                     argv[0]);
        return 1;
    }
    const int size = 32;
    const int spp = 512;
    auto lamb = std::make_shared<LambertianBRDF>();
    auto white_m = std::make_shared<ConstantMaterial>(Color<float>(1, 1, 1, 1));
    auto white = std::make_shared<ConstantMaterialHandler>(white_m, lamb);
    auto light_m = std::make_shared<ConstantMaterial>(
      Color<float>(1, 1, 1, 1), 1.0F,
      Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F)));
    auto light = std::make_shared<ConstantMaterialHandler>(light_m, lamb);

    {  // (a) thin lens + circular aperture, panel-lit box
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        addBox(objects, white, light, true);
        Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                      {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F, 0.1F, 0.1F,
                      std::make_unique<CircularApertureSampler>(), 1.5F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{size, size, spp, spp, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        auto img = processJob(job);
        dump(img, argv[1]);
    }

    {  // (b) emissive sphere as the only light, pinhole camera
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        addBox(objects, white, light, false);
        auto em_m = std::make_shared<ConstantMaterial>(
          Color<float>(1, 1, 1, 1), 1.0F,
          Spectrum(Color<float>(2.0F, 2.0F, 2.0F, 1.0F)));
        auto em = std::make_shared<ConstantMaterialHandler>(em_m, lamb);
        auto s = std::make_unique<Sphere>(vec3<float>(0.0F, 0.55F, 0.5F), 0.25F);
        s->setMaterialHandler(em);
        objects.emplace_back(std::move(s));
        Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                      {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{size, size, spp, spp, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        auto img = processJob(job);
        dump(img, argv[2]);
    }

    {  // (c) hexagonal aperture (ratio 0.6) + thin lens, panel-lit box
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        addBox(objects, white, light, true);
        Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                      {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F, 0.12F, 0.12F,
                      std::make_unique<HexagonalApertureSampler>(0.6F), 1.5F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{size, size, spp, spp, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        auto img = processJob(job);
        dump(img, argv[3]);
    }
    return 0;
}
