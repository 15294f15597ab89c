/* VrtExample.java — embedding volumeraytracer from Java via the vrt_native
 * C ABI using the Panama FFI (java.lang.foreign, JDK 22+).
 *
 * This is the framework's Java-facing glue, playing the role of the
 * reference's JNI binding (/root/reference/src/java_binding.cpp:179-241
 * new_instance, :248-287 trace_rays on direct buffers, :322-381 options
 * get/set by integer key) — redesigned over a plain C ABI + Panama instead
 * of hand-written JNI stubs: no native glue code per method, and the same
 * library serves every FFI-capable host language (see vrt_native.h).
 *
 * Build + run (needs a JDK with java.lang.foreign, 22+):
 *     make -C native java-example
 * or  javac VrtExample.java && java --enable-native-access=ALL-UNNAMED \
 *       -Djava.library.path=. VrtExample
 */
import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.invoke.MethodHandle;

import static java.lang.foreign.ValueLayout.ADDRESS;
import static java.lang.foreign.ValueLayout.JAVA_FLOAT;
import static java.lang.foreign.ValueLayout.JAVA_INT;
import static java.lang.foreign.ValueLayout.JAVA_LONG;

public final class VrtExample {
    // option keys (vrt_native.h, ≙ java_binding.cpp:322-381)
    static final int VRT_OPT_LOGLEVEL = 0;
    static final int VRT_OPT_MINIMUM_DEVICE = 1;
    static final int VRT_OPT_MAX_CPU = 2;

    public static void main(String[] args) throws Throwable {
        Linker linker = Linker.nativeLinker();
        SymbolLookup lib = SymbolLookup.libraryLookup("libvrt_native.so",
                Arena.global());

        MethodHandle optionsNew = linker.downcallHandle(
                lib.find("vrt_options_new").get(),
                FunctionDescriptor.of(ADDRESS));
        MethodHandle optionsSet = linker.downcallHandle(
                lib.find("vrt_options_set").get(),
                FunctionDescriptor.of(JAVA_INT, ADDRESS, JAVA_INT, JAVA_LONG));
        MethodHandle optionsGet = linker.downcallHandle(
                lib.find("vrt_options_get").get(),
                FunctionDescriptor.of(JAVA_LONG, ADDRESS, JAVA_INT));
        MethodHandle optionsFree = linker.downcallHandle(
                lib.find("vrt_options_free").get(),
                FunctionDescriptor.ofVoid(ADDRESS));
        MethodHandle sceneNewOpt = linker.downcallHandle(
                lib.find("vrt_scene_new_opt").get(),
                FunctionDescriptor.of(ADDRESS, ADDRESS, JAVA_INT, JAVA_INT,
                        JAVA_INT, ADDRESS, ADDRESS));
        MethodHandle sceneTrace = linker.downcallHandle(
                lib.find("vrt_scene_trace").get(),
                FunctionDescriptor.ofVoid(ADDRESS, ADDRESS, ADDRESS, ADDRESS,
                        JAVA_INT, JAVA_INT, ADDRESS, JAVA_INT, JAVA_INT));
        MethodHandle sceneFree = linker.downcallHandle(
                lib.find("vrt_scene_free").get(),
                FunctionDescriptor.ofVoid(ADDRESS));

        try (Arena arena = Arena.ofConfined()) {
            // options by key (≙ OpticalVolumeObject.new_options/set/get)
            MemorySegment opt = (MemorySegment) optionsNew.invoke();
            long maxCpu = (long) optionsGet.invoke(opt, VRT_OPT_MAX_CPU);
            if (maxCpu != 256) throw new AssertionError("default max_cpu");
            optionsSet.invoke(opt, VRT_OPT_LOGLEVEL, 0L);
            optionsSet.invoke(opt, VRT_OPT_MAX_CPU, 4L);

            // reference scaling-test bar: ior ramp 1 -> 2 over 100 voxels
            // (cuda_volume_raytracer_test.h:11-28)
            final int X = 100, Y = 10, Z = 10;
            MemorySegment ior = arena.allocate(JAVA_FLOAT, (long) X * Y * Z);
            for (int i = 0; i < X; ++i) {
                float n = 1.0f + (float) i / (X - 1);
                for (int j = 0; j < Y * Z; ++j)
                    ior.setAtIndex(JAVA_FLOAT, (long) i * Y * Z + j, n);
            }
            MemorySegment scene = (MemorySegment) sceneNewOpt.invoke(
                    ior, X, Y, Z, MemorySegment.NULL, opt);
            optionsFree.invoke(opt);
            if (scene.equals(MemorySegment.NULL))
                throw new AssertionError("scene_new failed");

            // trace in place (≙ trace_rays on direct NIO buffers,
            // java_binding.cpp:84-169)
            MemorySegment pos = arena.allocateFrom(JAVA_FLOAT,
                    1.0f, 4.0f, 4.0f);
            MemorySegment dir = arena.allocateFrom(JAVA_FLOAT,
                    16.0f, 0.0f, 0.0f);
            MemorySegment iters = arena.allocate(JAVA_INT, 1);
            MemorySegment invscale = arena.allocateFrom(JAVA_FLOAT,
                    2.0f, 2.0f, 2.0f);
            sceneTrace.invoke(scene, pos, dir, iters, 1, 1000000,
                    invscale, 1, 0);
            sceneFree.invoke(scene);

            double vx = dir.getAtIndex(JAVA_FLOAT, 0);
            double vy = dir.getAtIndex(JAVA_FLOAT, 1);
            double vz = dir.getAtIndex(JAVA_FLOAT, 2);
            double ratio = Math.sqrt(vx * vx + vy * vy + vz * vz) / 16.0;
            double expect = 2.0 / (1.0 + 1.0 / 99.0);
            System.out.printf("end pos (%.3f %.3f %.3f) steps %d "
                            + "|v| ratio %.4f (expect %.4f)%n",
                    pos.getAtIndex(JAVA_FLOAT, 0),
                    pos.getAtIndex(JAVA_FLOAT, 1),
                    pos.getAtIndex(JAVA_FLOAT, 2),
                    iters.getAtIndex(JAVA_INT, 0), ratio, expect);
            if (Math.abs(ratio - expect) > 0.01)
                throw new AssertionError("momentum invariant violated");
            System.out.println("OK");
        }
    }
}
