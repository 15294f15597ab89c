/* example.c — embedding volumeraytracer from plain C via the vrt_native
 * C ABI (the second-language binding; see vrt_native.h).
 *
 * Builds the reference scaling-test scene shape (a bar with the index
 * ramping 1 -> 2, cuda_volume_raytracer_test.h:11-28) and checks the
 * optical-momentum invariant |v_end|/|v_start| = n(end)/n(start).
 *
 * Build + run:  make -C native example && ./native/vrt_example
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>

#include "vrt_native.h"

int main(void) {
    const int X = 100, Y = 10, Z = 10;
    float* ior = malloc(sizeof(float) * X * Y * Z);
    for (int i = 0; i < X; ++i) {
        const float n = 1.0f + (float)i / (float)(X - 1);
        for (int j = 0; j < Y * Z; ++j) ior[i * Y * Z + j] = n;
    }
    /* options get/set by integer key (≙ java_binding.cpp:322-381) */
    vrt_options* opt = vrt_options_new();
    if (vrt_options_get(opt, VRT_OPT_MINIMUM_DEVICE) != 0x80 ||
        vrt_options_get(opt, VRT_OPT_MAX_CPU) != 256) {
        fprintf(stderr, "FAIL: option defaults\n"); return 1;
    }
    vrt_options_set(opt, VRT_OPT_LOGLEVEL, 0);
    vrt_options_set(opt, VRT_OPT_MAX_CPU, 4);
    if (vrt_options_set(opt, 99, 1) != -1 ||
        vrt_options_get(opt, 99) != INT64_MIN) {
        fprintf(stderr, "FAIL: unknown option key must be rejected\n");
        return 1;
    }

    vrt_scene* scene = vrt_scene_new_opt(ior, X, Y, Z, NULL, opt);
    vrt_options_free(opt);
    if (!scene) { fprintf(stderr, "scene_new failed\n"); return 1; }

    float pos[3] = {1.0f, 4.0f, 4.0f};
    float dir[3] = {16.0f, 0.0f, 0.0f};
    uint32_t iters = 0;
    const float invscale[3] = {2.0f, 2.0f, 2.0f};
    vrt_scene_trace(scene, pos, dir, &iters, 1, 1000000u, invscale, 1, 0);

    const double v_end = sqrt((double)dir[0] * dir[0] +
                              (double)dir[1] * dir[1] +
                              (double)dir[2] * dir[2]);
    const double ratio = v_end / 16.0;             /* = n(end)/n(start)    */
    const double expect = 2.0 / (1.0 + 1.0 / 99.0); /* start n ~ 1.0101    */
    printf("end pos (%.3f %.3f %.3f) steps %u  |v| ratio %.4f (expect %.4f)\n",
           pos[0], pos[1], pos[2], iters, ratio, expect);
    vrt_scene_free(scene);
    free(ior);
    if (fabs(ratio - expect) > 0.01) {
        fprintf(stderr, "FAIL: momentum invariant violated\n");
        return 1;
    }
    printf("OK\n");
    return 0;
}
