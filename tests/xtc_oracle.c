/* Test oracle driver: exercises the *reference* xdrfile library (compiled
 * from /root/reference, read-only) to produce golden .xtc fixtures and to
 * dump frames for byte/value comparison against clustering_tpu.utils.xtc.
 *
 * usage:
 *   xtc_oracle write <file.xtc> <natoms> <nframes> <seed> <precision>
 *   xtc_oracle read  <file.xtc>
 */
#include <stdio.h>
#include <stdlib.h>
#include "xdrfile.h"
#include "xdrfile_xtc.h"

static unsigned long long rng_state;
static double rng_next(void) {
    /* xorshift64* */
    rng_state ^= rng_state >> 12;
    rng_state ^= rng_state << 25;
    rng_state ^= rng_state >> 27;
    unsigned long long r = rng_state * 2685821657736338717ULL;
    return (double)(r >> 11) / 9007199254740992.0;
}

int main(int argc, char** argv) {
    if (argc < 3) return 2;
    const char* mode = argv[1];
    const char* path = argv[2];
    if (mode[0] == 'w') {
        int natoms = atoi(argv[3]);
        int nframes = atoi(argv[4]);
        rng_state = (unsigned long long)atoll(argv[5]) | 1ULL;
        float prec = (float)atof(argv[6]);
        XDRFILE* xd = xdrfile_open(path, "w");
        if (!xd) return 1;
        rvec* x = calloc(natoms, sizeof(rvec));
        matrix box = {{2.f, 0.f, 0.f}, {0.f, 2.f, 0.f}, {0.f, 0.f, 2.f}};
        for (int f = 0; f < nframes; ++f) {
            for (int i = 0; i < natoms; ++i) {
                /* mix of smooth chains (compressible runs) and jumps */
                if (i % 7 == 0) {
                    x[i][0] = (float)(rng_next() * 4.0 - 2.0);
                    x[i][1] = (float)(rng_next() * 4.0 - 2.0);
                    x[i][2] = (float)(rng_next() * 4.0 - 2.0);
                } else {
                    x[i][0] = x[i - 1][0] + (float)(rng_next() * 0.02 - 0.01);
                    x[i][1] = x[i - 1][1] + (float)(rng_next() * 0.02 - 0.01);
                    x[i][2] = x[i - 1][2] + (float)(rng_next() * 0.02 - 0.01);
                }
            }
            if (write_xtc(xd, natoms, f, 0.1f * f, box, x, prec) != exdrOK)
                return 1;
        }
        xdrfile_close(xd);
        free(x);
    } else {
        int natoms;
        if (read_xtc_natoms(path, &natoms) != exdrOK) return 1;
        XDRFILE* xd = xdrfile_open(path, "r");
        rvec* x = calloc(natoms, sizeof(rvec));
        int step; float time, prec; matrix box;
        while (read_xtc(xd, natoms, &step, &time, box, x, &prec) == exdrOK) {
            printf("frame %d %.6f %.6f\n", step, time, prec);
            for (int i = 0; i < natoms; ++i)
                printf("%.9g %.9g %.9g\n", x[i][0], x[i][1], x[i][2]);
        }
        xdrfile_close(xd);
        free(x);
    }
    return 0;
}
