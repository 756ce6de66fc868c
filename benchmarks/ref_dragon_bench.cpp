// Reference-CPU denominator harness for the renderSceneDragonBox workload
// at arbitrary mesh scale.
//
// This is a *client of the reference library* (like tests/golden/make_golden_*):
// it links /root/reference's libPathTrace.a and drives the reference's own
// processJob on the dragon-box benchmark scene (benchmark/main.cpp:59-105
// semantics: closed 2x2x2 box + ceiling light + glass dragon, IOR 1.5,
// scale 0.01, offset (0,-0.5,0); camera at (0,0,-3), aspect -1), but takes
// the OBJ path / spp / iteration count from argv so the SAME synthetic
// full-scale dragon OBJ used by bench.py (models/scenes.py:standin_dragon_obj)
// can be fed to both implementations. google-benchmark is not in this image;
// timing is std::chrono around processJob, best-of-N after one warmup,
// identical to the BASELINE.md methodology for the published 0.883/0.308
// numbers.
//
// Build:
//   g++ -O3 -std=c++20 -I/root/reference/include ref_dragon_bench.cpp \
//       <path>/libPathTrace.a -lpng -lpthread -o ref_dragon_bench
// Run:
//   ./ref_dragon_bench /tmp/dragon.obj 16 3
#include <PathTrace/base.h>
#include <PathTrace/camera.h>
#include <PathTrace/scene/light.h>
#include <PathTrace/scene/mesh.h>
#include <PathTrace/scene/object.h>
#include <PathTrace/scene/scene.h>
#include <PathTrace/worker.h>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <string>
#include <utility>
#include <vector>

int main(int argc, char **argv) {
    if(argc < 2) {
        std::fprintf(stderr, "usage: %s dragon.obj [spp=16] [iters=3]\n", argv[0]);
        return 2;
    }
    const std::string obj_path = argv[1];
    const int spp = argc > 2 ? std::atoi(argv[2]) : 16;
    const int iters = argc > 3 ? std::atoi(argv[3]) : 3;
    const int image_width = 128;
    const int image_height = 128;

    Camera camera({0.0F, 0.0F, -3.0F}, {0.0F, 0.0F, 0.0F}, {0.0F, 1.0F, 0.0F}, 1.0F, 1.0F, -1.0F);

    std::vector<std::unique_ptr<Object>> objects;
    std::vector<std::unique_ptr<LightSource>> light_sources;

    auto lambertian_brdf = std::make_shared<LambertianBRDF>();
    auto glass_bdf = std::make_shared<GlassBDF>();

    auto box_triangles = makeBox(vec3<float>{-1.0F, -1.0F, -1.0F}, vec3<float>{1.0F, 1.0F, 1.0F});
    moveObjects(objects, box_triangles);

    auto ceiling_light_objects =
      makePlane(vec3<float>{-0.25F, 1.0F - 0.01F, -0.25F}, vec3<float>{0.25F, 1.0F - 0.01F, 0.25F}, true);
    auto ceiling_light_material = std::make_shared<ConstantMaterial>(
      Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.0F, Spectrum(Color<float>{1.0F, 1.0F, 1.0F, 1.0F}));
    auto ceiling_light_material_handler =
      std::make_shared<ConstantMaterialHandler>(ceiling_light_material, lambertian_brdf);
    for(auto &object : ceiling_light_objects) {
        object.setMaterialHandler(ceiling_light_material_handler);
    }
    moveObjects(objects, ceiling_light_objects);

    {
        mat4<float> transformation{vec4<float>{0.01F, 0.0F, 0.0F, 0.0F},
                                   vec4<float>{0.0F, 0.01F, 0.0F, -0.5F},
                                   vec4<float>{0.0F, 0.0F, 0.01F, 0.0F},
                                   vec4<float>{0.0F, 0.0F, 0.0F, 1.0F}};

        auto t_load0 = std::chrono::steady_clock::now();
        auto mesh_triangles = io::loadMesh(obj_path, transformation, false, true);
        auto load_s = std::chrono::duration<double>(std::chrono::steady_clock::now() - t_load0).count();
        std::fprintf(stderr, "# loaded %zu triangles in %.1fs\n", mesh_triangles.size(), load_s);
        if(mesh_triangles.empty()) {
            std::fprintf(stderr, "failed to load mesh\n");
            return 1;
        }

        auto dragon_material = std::make_shared<ConstantMaterial>(Color<float>(1.0F, 1.0F, 1.0F, 1.0F), 1.5F);
        auto dragon_material_handler = std::make_shared<ConstantMaterialHandler>(dragon_material, glass_bdf);
        for(auto &triangle : mesh_triangles) {
            triangle.setMaterialHandler(dragon_material_handler);
        }
        moveObjects(objects, mesh_triangles);
    }

    auto t_bvh0 = std::chrono::steady_clock::now();
    Scene scene(std::move(objects), std::move(light_sources));
    auto bvh_s = std::chrono::duration<double>(std::chrono::steady_clock::now() - t_bvh0).count();
    std::fprintf(stderr, "# Scene/BVH built in %.1fs\n", bvh_s);

    RenderOptions options{image_width, image_height, spp, spp, 1E-3F};
    FrameRenderJob job{camera, scene, options};

    double best_ms = 1e30;
    for(int i = -1; i < iters; i++) { // i = -1 is warmup
        auto t0 = std::chrono::steady_clock::now();
        auto output_image = processJob(job);
        auto ms = std::chrono::duration<double, std::milli>(std::chrono::steady_clock::now() - t0).count();
        // Defeat dead-code elimination the way DoNotOptimize would.
        volatile float sink = output_image(0, 0).r();
        (void)sink;
        if(i >= 0) {
            best_ms = best_ms < ms ? best_ms : ms;
            double mrays = double(image_width) * image_height * spp / (ms * 1e-3) / 1e6;
            std::fprintf(stderr, "# iter %d: %.0f ms (%.4f Mrays/s)\n", i, ms, mrays);
        } else {
            std::fprintf(stderr, "# warmup: %.0f ms\n", ms);
        }
    }
    double mrays = double(image_width) * image_height * spp / (best_ms * 1e-3) / 1e6;
    std::printf("{\"workload\": \"renderSceneDragonBox\", \"obj\": \"%s\", \"spp\": %d, "
                "\"best_ms\": %.1f, \"mrays_per_s\": %.4f}\n",
                obj_path.c_str(), spp, best_ms, mrays);
    return 0;
}
