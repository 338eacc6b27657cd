"""Slow, literal Python transcriptions of reference algorithms, used only
as test oracles (small N). These intentionally mirror the C control flow
step by step; the production code in mdbench_tpu/ is vectorized and must
match these exactly."""

from __future__ import annotations

import numpy as np

IA, IM, IQ, IR = 16807, 2147483647, 127773, 2836
AM = 1.0 / IM


def myrandom(seed: int) -> tuple[int, float]:
    """reference: src/common/util.c:24-33"""
    k = seed // IQ
    seed = IA * (seed - k * IQ) - IR * k
    if seed < 0:
        seed += IM
    return seed, AM * seed


def create_atom_reference(nx, ny, nz, rho, ntypes=1):
    """Literal transcription of createAtom
    (reference: src/verletlist/atom.c:67-187), scalar loop."""
    lattice = (4.0 / rho) ** (1.0 / 3.0)
    xprd, yprd, zprd = nx * lattice, ny * lattice, nz * lattice
    xlo = ylo = zlo = 0.0
    xhi, yhi, zhi = xprd, yprd, zprd
    alat = (4.0 / rho) ** (1.0 / 3.0)

    ilo = max(int(xlo / (0.5 * alat) - 1), 0)
    ihi = min(int(xhi / (0.5 * alat) + 1), 2 * nx - 1)
    jlo = max(int(ylo / (0.5 * alat) - 1), 0)
    jhi = min(int(yhi / (0.5 * alat) + 1), 2 * ny - 1)
    klo = max(int(zlo / (0.5 * alat) - 1), 0)
    khi = min(int(zhi / (0.5 * alat) + 1), 2 * nz - 1)

    xs, vs = [], []
    sx = sy = sz = ox = oy = oz = 0
    subboxdim = 8

    while oz * subboxdim <= khi:
        k = oz * subboxdim + sz
        j = oy * subboxdim + sy
        i = ox * subboxdim + sx

        if (
            (i + j + k) % 2 == 0
            and ilo <= i <= ihi
            and jlo <= j <= jhi
            and klo <= k <= khi
        ):
            xtmp = 0.5 * alat * i
            ytmp = 0.5 * alat * j
            ztmp = 0.5 * alat * k
            if xlo <= xtmp < xhi and ylo <= ytmp < yhi and zlo <= ztmp < zhi:
                n = k * (2 * ny) * (2 * nx) + j * (2 * nx) + i + 1
                for _ in range(5):
                    n, _u = myrandom(n)
                n, vxtmp = myrandom(n)
                for _ in range(5):
                    n, _u = myrandom(n)
                n, vytmp = myrandom(n)
                for _ in range(5):
                    n, _u = myrandom(n)
                n, vztmp = myrandom(n)
                xs.append((xtmp, ytmp, ztmp))
                vs.append((vxtmp, vytmp, vztmp))

        sx += 1
        if sx == subboxdim:
            sx = 0
            sy += 1
        if sy == subboxdim:
            sy = 0
            sz += 1
        if sz == subboxdim:
            sz = 0
            ox += 1
        if ox * subboxdim > ihi:
            ox = 0
            oy += 1
        if oy * subboxdim > jhi:
            oy = 0
            oz += 1

    return np.array(xs, np.float64), np.array(vs, np.float64)


def lj_force_reference(x, xprd, yprd, zprd, cutforce, sigma6, epsilon):
    """Scalar all-pairs LJ with minimum image — same pair math as
    reference: src/verletlist/force_lj.c:69-75."""
    n = x.shape[0]
    f = np.zeros_like(x)
    prd = np.array([xprd, yprd, zprd])
    cutsq = cutforce * cutforce
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            d = x[i] - x[j]
            d -= prd * np.round(d / prd)
            rsq = float(d @ d)
            if rsq < cutsq:
                sr2 = 1.0 / rsq
                sr6 = sr2 * sr2 * sr2 * sigma6
                force = 48.0 * sr6 * (sr6 - 0.5) * sr2 * epsilon
                f[i] += d * force
    return f


def eam_force_reference(x, prd, cutforce, tables):
    """Scalar transcription of computeForceEam (reference:
    src/verletlist/force_eam.c:19-231) on dense min-image pairs, using
    the spline tables from models.eam_tables."""
    n = x.shape[0]
    rhor, frho, z2r = tables.rhor_spline, tables.frho_spline, tables.z2r_spline
    rdr, rdrho, nr, nrho = tables.rdr, tables.rdrho, tables.nr, tables.nrho
    cutsq = cutforce * cutforce
    prd = np.asarray(prd)

    def pairs(i):
        for j in range(n):
            if j == i:
                continue
            d = x[i] - x[j]
            d -= prd * np.round(d / prd)
            rsq = float(d @ d)
            if rsq < cutsq:
                yield j, d, rsq

    fp = np.zeros(n)
    for i in range(n):
        rhoi = 0.0
        for j, d, rsq in pairs(i):
            p = np.sqrt(rsq) * rdr + 1.0
            m = int(p)
            m = min(m, nr - 1)
            p -= m
            p = min(p, 1.0)
            rhoi += ((rhor[m, 3] * p + rhor[m, 4]) * p + rhor[m, 5]) * p + rhor[m, 6]
        p = 1.0 * rhoi * rdrho + 1.0
        m = int(p)
        m = max(1, min(m, nrho - 1))
        p -= m
        p = min(p, 1.0)
        fp[i] = (frho[m, 0] * p + frho[m, 1]) * p + frho[m, 2]

    f = np.zeros_like(x)
    for i in range(n):
        for j, d, rsq in pairs(i):
            r = np.sqrt(rsq)
            p = r * rdr + 1.0
            m = int(p)
            m = min(m, nr - 1)
            p -= m
            p = min(p, 1.0)
            rhoip = (rhor[m, 0] * p + rhor[m, 1]) * p + rhor[m, 2]
            z2p = (z2r[m, 0] * p + z2r[m, 1]) * p + z2r[m, 2]
            z2 = ((z2r[m, 3] * p + z2r[m, 4]) * p + z2r[m, 5]) * p + z2r[m, 6]
            recip = 1.0 / r
            phi = z2 * recip
            phip = z2p * recip - phi * recip
            psip = fp[i] * rhoip + fp[j] * rhoip + phip
            fpair = -psip * recip
            f[i] += d * fpair
    return f
