/* Example shared-library simulator (the reference's `shared` binding,
 * AbcSim.h:96-114, rebuilt on this framework's portable C ABI):
 *
 *   int abc_simulator(const double* pars, size_t npar,
 *                     unsigned long seed, unsigned long serial,
 *                     double* mets, size_t nmet);
 *
 * Build:  gcc -O2 -shared -fPIC -o libdice.so examples/dice_sim.c -lm
 * Config: { "shared": "./libdice.so", ... }
 *
 * Rolls pars[0] dice with pars[1] faces; metrics = {sum, sd} (the dice game,
 * reference examples/include/dice.h semantics).
 */

#include <math.h>
#include <stddef.h>

/* xorshift64 PRNG: self-contained, seeded per particle for replayability */
static unsigned long long xs64(unsigned long long *s) {
    unsigned long long x = *s;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    return *s = x;
}

int abc_simulator(const double *pars, size_t npar,
                  unsigned long seed, unsigned long serial,
                  double *mets, size_t nmet) {
    (void)serial;
    if (npar < 2 || nmet < 2) return 1;
    long n = (long)pars[0];
    long m = (long)pars[1];
    if (n < 1) n = 1;
    if (m < 1) m = 1;

    unsigned long long state = (unsigned long long)seed * 2685821657736338717ULL + 1;
    double sum = 0.0, sumsq = 0.0;
    for (long i = 0; i < n; ++i) {
        double roll = (double)(xs64(&state) % (unsigned long long)m) + 1.0;
        sum += roll;
        sumsq += roll * roll;
    }
    mets[0] = sum;
    mets[1] = (n > 1) ? sqrt((sumsq - sum * sum / n) / (n - 1)) : 0.0;
    return 0;
}
