/* Test-only parity oracle.
 *
 * Links the reference implementation's spectra.c and voigt.c (compiled
 * unmodified, straight from /root/reference) behind an array-based driver so
 * tests can obtain bit-exact reference spectra for arbitrary synthetic line
 * lists without sqlite or network access.  This file is part of the test
 * harness, NOT of the framework: the framework's compute path is JAX/Pallas.
 */
#include <math.h>
#include <stdlib.h>
#include <string.h>

#include "spectral_database.h"
#include "spectra.h"

/* Same contract as the reference C interpolation
 * (spectral_database.c:97-104): uniform-grid floor indexing into the
 * per-isotopologue table rows. */
double total_partition_function(Tips_t tips, double temperature, int iso)
{
    int offset = iso * tips.num_t;
    double *t = tips.temperature + offset;
    double *q = tips.data + offset;
    int i = (int)(floor(temperature)) - (int)(t[0]);
    return q[i] + (q[i + 1] - q[i]) * (temperature - t[i]) / (t[i + 1] - t[i]);
}

/* Replicates the reference absorption() driver loop (absorption.c:19-99)
 * with line parameters supplied as arrays instead of a sqlite cursor. */
int oracle_absorption(double pressure, double temperature,
                      double volume_mixing_ratio,
                      int v0, int vn, int n_per_v,
                      int num_lines,
                      double const *nu, double const *sw,
                      double const *gamma_air, double const *gamma_self,
                      double const *n_air, double const *elower,
                      double const *delta_air, int const *local_iso_id,
                      double const *mass_slots, /* [32], keyed isoid-1 */
                      int num_t, int num_iso,
                      double const *tips_temperature, /* [num_iso*num_t] */
                      double const *tips_data,        /* [num_iso*num_t] */
                      double *k, int cut_off, int remove_pedestal)
{
    double dv = 1. / n_per_v;
    int n = (vn - v0) * n_per_v;
    double *v = malloc(sizeof(double) * n);
    int i;
    for (i = 0; i < n; ++i)
    {
        v[i] = v0 + i * dv;
    }
    memset(k, 0, sizeof(double) * n);

    Tips_t tips;
    tips.num_iso = num_iso;
    tips.num_t = num_t;
    tips.temperature = (double *)tips_temperature;
    tips.data = (double *)tips_data;

    for (i = 0; i < num_lines; ++i)
    {
        LineParameter_t parameter;
        parameter.nu = nu[i];
        parameter.sw = sw[i];
        parameter.gamma_air = gamma_air[i];
        parameter.gamma_self = gamma_self[i];
        parameter.n_air = n_air[i];
        parameter.elower = elower[i];
        parameter.delta_air = delta_air[i];
        parameter.local_iso_id = local_iso_id[i] == 0 ? 10 : local_iso_id[i];
        parameter.mass = mass_slots[parameter.local_iso_id - 1];
        if (parameter.nu > vn + cut_off + 1 || parameter.nu < v0 - (cut_off + 1))
        {
            break;
        }
        spectra(temperature, pressure, volume_mixing_ratio, parameter, tips,
                v, n, n_per_v, k, cut_off, remove_pedestal);
    }
    free(v);
    return 0;
}

/* Direct access to the reference Voigt kernel for unit-level parity. */
void oracle_voigt(double const *wavenumbers, int start, int end, double nu,
                  double alpha, double gamma, double sw, double *k)
{
    voigt((double *)wavenumbers, start, end, nu, alpha, gamma, sw, k);
}
