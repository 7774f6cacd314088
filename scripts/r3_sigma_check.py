"""Independent f64 check of sigma(M) at small masses vs our cosmology module.

Implements the EH99 mdm transfer (Eisenstein & Hu 1999, as used by the
reference cosmology.c:52-70 + TFset_parameters:458-503) and the tophat
sigma^2 integral with scipy QUADPACK, then compares our Cosmology.sigma
tables over M = 1e4..1e16.  The global-history parity gap (gold SFRD much
larger at z ~ 35-40) is exponentially sensitive to sigma at M ~ 1e7.
"""
import sys
import numpy as np
from scipy import integrate

sys.path.insert(0, "/root/repo")

T_CMB = 2.7255
N_NU = 1.0

h = 0.6766
OMm = 0.30964144154550644
OMb = 0.04897468161869667
OMn = 0.0
ns = 0.9665
sigma8 = 0.8102

omhh = OMm * h * h
obhh = OMb * h * h
theta = T_CMB / 2.7
f_nu = max(OMn / OMm, 1e-10)
f_b = max(OMb / OMm, 1e-10)

z_eq = 25000 * omhh * theta**-4 - 1.0
k_eq = 0.0746 * omhh / theta**2
z_d = 0.313 * omhh**-0.419 * (1 + 0.607 * omhh**0.674)
z_d = 1 + z_d * obhh ** (0.238 * omhh**0.223)
z_d *= 1291 * omhh**0.251 / (1 + 0.659 * omhh**0.828)
y_d = (1 + z_eq) / (1 + z_d)
R_d = 31.5 * obhh * theta**-4 * 1000 / (1 + z_d)
R_eq = 31.5 * obhh * theta**-4 * 1000 / (1 + z_eq)
s_hor = (2.0 / 3.0 / k_eq * np.sqrt(6.0 / R_eq)
         * np.log((np.sqrt(1 + R_d) + np.sqrt(R_d + R_eq)) / (1 + np.sqrt(R_eq))))
p_c = -(5 - np.sqrt(1 + 24 * (1 - f_nu - f_b))) / 4.0
p_cb = -(5 - np.sqrt(1 + 24 * (1 - f_nu))) / 4.0
f_c = 1 - f_nu - f_b
f_cb = 1 - f_nu
f_nub = f_nu + f_b
a_nu = (f_c / f_cb) * (2 * (p_c + p_cb) + 5) / (4 * p_cb + 5.0)
a_nu *= 1 - 0.553 * f_nub + 0.126 * f_nub**3
a_nu /= 1 - 0.193 * np.sqrt(f_nu) + 0.169 * f_nu
a_nu *= (1 + y_d) ** (p_c - p_cb)
a_nu *= 1 + (p_cb - p_c) / 2 * (1 + 1 / (4 * p_c + 3) / (4 * p_cb + 7)) / (1 + y_d)
beta_c = 1.0 / (1 - 0.949 * f_nub)


def transfer(k):
    q = k * theta**2 / omhh
    gamma_eff = np.sqrt(a_nu) + (1 - np.sqrt(a_nu)) / (1 + (0.43 * k * s_hor) ** 4)
    q_eff = q / gamma_eff
    tfm = np.log(np.e + 1.84 * beta_c * np.sqrt(a_nu) * q_eff)
    tfm = tfm / (tfm + q_eff**2 * (14.4 + 325.0 / (1 + 60.5 * q_eff**1.11)))
    q_nu = 3.92 * q / np.sqrt(f_nu / N_NU)
    tfm *= 1 + (1.2 * f_nu**0.64 * N_NU ** (0.3 + 0.6 * f_nu)) / (
        q_nu**-1.6 + q_nu**0.8
    )
    return tfm


RHOcrit = 2.7754e11 * h * h  # Msun/Mpc^3 approx; only enters via MtoR consistency


def MtoR(M):
    rho = OMm * RHOcrit
    return (3 * M / (4 * np.pi * rho)) ** (1.0 / 3.0)


def w_tophat(kR):
    return 3.0 * (np.sin(kR) / kR**3 - np.cos(kR) / kR**2)


def sigma_unnorm(R):
    def f(lnk):
        k = np.exp(lnk)
        p = k**ns * transfer(k) ** 2
        return k**3 * p * w_tophat(k * R) ** 2 / (2 * np.pi**2)

    val, _ = integrate.quad(f, np.log(1e-6 / R), np.log(350.0 / R), limit=400)
    return np.sqrt(val)


norm = sigma8 / sigma_unnorm(8.0 / h)

import py21cmfast_tpu as p21

inp = p21.InputParameters(random_seed=1).evolve_input_structs(
    A_s=2.105e-9, OMm=OMm, OMb=OMb, hlittle=h, POWER_INDEX=ns, HMF="ST",
)
c = inp.cosmology
print(f"our sigma8 eff: {inp.cosmo_params.sigma_8_effective}")
print(f"{'M':>10} {'sigma_ref':>12} {'sigma_ours':>12} {'ratio':>8}")
for M in np.logspace(4, 16, 13):
    R = MtoR(M)
    s_ref = norm * sigma_unnorm(R)
    s_ours = float(c.sigma_z0(np.array([M]))[0])
    print(f"{M:10.2e} {s_ref:12.5f} {s_ours:12.5f} {s_ours/s_ref:8.4f}")
