// Golden generators for the three original render-parity fixtures
// (recreated; the raws in this directory were produced by an identical
// harness): (a) golden_box_32.raw — the inward-wound panel-lit box of
// tests/scenes_util.py, 32x32 @ 512 spp; (b) golden_sphere_32.raw —
// point light + white sphere (test/render_test.cpp-style geometry),
// 32x32 @ 512 spp; (c) golden_dragon_32.raw — the benchmark dragon box
// (20k-triangle stand-in OBJ as glass IOR 1.5), 32x32 @ 256 spp.
// Usage: make_golden_render box.raw sphere.raw dragon.raw dragon.obj
// where dragon.obj is standin_dragon_obj(20000) dumped from Python.
// Raw format matches tests/test_parity.py::read_golden.
#include <PathTrace/camera.h>
#include <PathTrace/scene/light.h>
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

static void addTris(ObjVec &objects, std::vector<Triangle> tris,
                    const std::shared_ptr<MaterialHandler> &mh) {
    for (auto &t : tris) t.setMaterialHandler(mh);
    moveObjects(objects, tris);
}

int main(int argc, char **argv) {
    if (argc < 5) {
        std::fprintf(stderr,
                     "usage: %s box.raw sphere.raw dragon.raw dragon.obj\n",
                     argv[0]);
        return 1;
    }
    auto lamb = std::make_shared<LambertianBRDF>();
    auto white_m = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F));
    auto white = std::make_shared<ConstantMaterialHandler>(white_m, lamb);
    auto light_m = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.0F,
      Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F)));
    auto light = std::make_shared<ConstantMaterialHandler>(light_m, lamb);

    {  // (a) inward box, 512 spp
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        addTris(objects, makePlane({1, -1, -1}, {-1, -1, 1}, true), white);
        addTris(objects, makePlane({-1, 1, -1}, {1, 1, 1}, true), white);
        addTris(objects,
                makePlane({-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F},
                          true),
                light);
        addTris(objects, makePlane({-1, -1, -1}, {1, 1, -1}, true), white);
        addTris(objects, makePlane({-1, -1, -1}, {-1, 1, 1}, true), white);
        addTris(objects, makePlane({1, -1, 1}, {-1, 1, 1}, true), white);
        addTris(objects, makePlane({1, -1, 1}, {1, 1, -1}, true), white);
        Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 0.9F},
                      {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, 1.0F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{32, 32, 512, 512, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        dump(processJob(job), argv[1]);
    }

    {  // (b) point light + sphere, 512 spp
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        lights.emplace_back(std::make_unique<PointLightSource>(
          vec3<float>(0.0F, 1.0F, 0.0F),
          Spectrum(Color<float>(1.0F, 1.0F, 1.0F, 1.0F))));
        auto s = std::make_unique<Sphere>(vec3<float>(0.0F, 0.0F, 0.6F), 0.5F);
        s->setMaterialHandler(white);
        objects.emplace_back(std::move(s));
        Camera camera({0.0F, 0.0F, 0.0F}, {0.0F, 0.0F, 1.0F},
                      {0.0F, 1.0F, 0.0F}, 0.1F, 1.0F, 1.0F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{32, 32, 512, 512, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        dump(processJob(job), argv[2]);
    }

    {  // (c) benchmark dragon box, 256 spp
        ObjVec objects;
        std::vector<std::unique_ptr<LightSource>> lights;
        addTris(objects, makeBox({-1, -1, -1}, {1, 1, 1}), white);
        addTris(objects,
                makePlane({-0.25F, 0.99F, -0.25F}, {0.25F, 0.99F, 0.25F},
                          true),
                light);
        auto glass_m = std::make_shared<ConstantMaterial>(
          Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.5F);
        auto glass = std::make_shared<ConstantMaterialHandler>(
          glass_m, std::make_shared<GlassBDF>());
        mat4<float> tf = mat4_identity<float>;
        tf.rows[0][0] = 0.01F;
        tf.rows[1][1] = 0.01F;
        tf.rows[1][3] = -0.5F;
        tf.rows[2][2] = 0.01F;
        addTris(objects, io::loadMesh(std::filesystem::path(argv[4]), tf,
                                      false, true),
                glass);
        Camera camera({0.0F, 0.0F, -3.0F}, {0.0F, 0.0F, 0.0F},
                      {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, -1.0F);
        Scene scene(std::move(objects), std::move(lights));
        RenderOptions options{32, 32, 256, 256, 1.0E-3F, false};
        FrameRenderJob job{camera, scene, options};
        dump(processJob(job), argv[3]);
    }
    return 0;
}
