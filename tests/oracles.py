"""NumPy oracle implementations of the reference MATLAB math.

These are independent re-derivations (spatial/full-spectrum domain, plain
loops) of the algorithms in /root/reference, used to validate the fused
frequency-domain TPU implementations.  Everything is float64.
"""
from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# PSFs
# ---------------------------------------------------------------------------

def grid(size):
    offs = np.arange(size) - (size - 1) / 2.0
    v = offs[:, None] * np.ones((1, size))
    u = np.ones((size, 1)) * offs[None, :]
    return v, u


def np_gaussian_kernel(size, w1, w2, phi=0.0):
    v, u = grid(size)
    U = u * np.cos(phi) - v * np.sin(phi)
    V = u * np.sin(phi) + v * np.cos(phi)
    c = w1**2 * U**2 + w2**2 * V**2
    f = (w1 * w2) / (2 * np.pi) * np.exp(-c / 2)
    return f / f.sum()


def np_laplace_kernel(size, b):
    v, u = grid(size)
    f = (b**2 / 4) * np.exp(-b * (np.abs(v) + np.abs(u)))
    return f / f.sum()


def np_moffat_kernel(size, a, b):
    v, u = grid(size)
    r2 = v**2 + u**2
    f = a**2 * (r2 * a**2 / b + 1) ** (-(b + 2) / 2) / (2 * np.pi)
    return f / f.sum()


# ---------------------------------------------------------------------------
# Blur operator (full-spectrum, like the MATLAB drivers)
# ---------------------------------------------------------------------------

def np_otf(kernel, shape):
    M, N = shape
    s = kernel.shape[0]
    padded = np.zeros((M, N))
    padded[:s, :s] = kernel
    return np.fft.fft2(padded)


def np_blur(x, H):
    return np.real(np.fft.ifft2(H * np.fft.fft2(x)))


def np_blur_adj(x, H):
    return np.real(np.fft.ifft2(np.conj(H) * np.fft.fft2(x)))


# ---------------------------------------------------------------------------
# TV norm and Chambolle prox
# ---------------------------------------------------------------------------

def np_tv(x):
    dh = x - np.roll(x, 1, axis=1)
    dv = x - np.roll(x, 1, axis=0)
    return np.sum(np.sqrt(dh**2 + dv**2))


def _np_div(p1, p2):
    u = np.concatenate([p1[:1, :], p1[1:-1, :] - p1[:-2, :], -p1[-1:, :]], axis=0)
    v = np.concatenate([p2[:, :1], p2[:, 1:-1] - p2[:, :-2], -p2[:, -1:]], axis=1)
    return u + v


def _np_grad(u):
    dux = np.concatenate([u[1:, :] - u[:-1, :], np.zeros((1, u.shape[1]))], axis=0)
    duy = np.concatenate([u[:, 1:] - u[:, :-1], np.zeros((u.shape[0], 1))], axis=1)
    return dux, duy


def np_chambolle(g, lam, max_iter, tau=0.249, tol=1e-3, duals=None):
    """Early-exit loop exactly like chambolle_prox_TV_stop.m:120-149."""
    if duals is None:
        px = np.zeros_like(g)
        py = np.zeros_like(g)
    else:
        px, py = (d.copy() for d in duals)
    k = 0
    err = np.inf
    while True:
        k += 1
        u = _np_div(px, py) - g / lam
        upx, upy = _np_grad(u)
        tmp = np.sqrt(upx**2 + upy**2)
        err = np.sqrt(
            np.sum((-upx + tmp * px) ** 2 + (-upy + tmp * py) ** 2)
        )
        px = (px + tau * upx) / (1 + tau * tmp)
        py = (py + tau * upy) / (1 + tau * tmp)
        if not (k < max_iter and err > tol):
            break
    f = g - lam * _np_div(px, py)
    return f, px, py, k, err


# ---------------------------------------------------------------------------
# One full SAPG iteration, spatial domain (SAPG_algorithm_Guassian.m:158-194)
# ---------------------------------------------------------------------------

def np_sapg_gaussian_step(
    X, proxGX, Z, y, theta, w1, w2, sigma2,
    psf_size, phi, gam, lam, d_scale, d_exp, ii,
    c_theta, c_w1, c_w2, c_sigma,
    boxes, fix, true_vals, sigma_init, chambolle_iters=25,
):
    """Returns (X_new, proxGX_new, theta_new, w1_new, w2_new, sigma_new, stats)."""
    d = X.size
    shape = X.shape

    def kern_and_grads(w1, w2):
        v, u = grid(psf_size)
        U = u * np.cos(phi) - v * np.sin(phi)
        V = u * np.sin(phi) + v * np.cos(phi)
        c = w1**2 * U**2 + w2**2 * V**2
        e = np.exp(-c / 2)
        f = (w1 * w2) / (2 * np.pi) * e
        dw1 = (w2 / (2 * np.pi)) * (1 - w1**2 * U**2) * e
        dw2 = (w1 / (2 * np.pi)) * (1 - w2**2 * V**2) * e
        S, S1, S2 = f.sum(), dw1.sum(), dw2.sum()
        k = f / S
        g1 = (dw1 * S - f * S1) / S**2
        g2 = (dw2 * S - f * S2) / S**2
        return k, g1, g2

    k, g1, g2 = kern_and_grads(w1, w2)
    H = np_otf(k, shape)
    dH1 = np_otf(g1, shape)
    dH2 = np_otf(g2, shape)

    gradF = np_blur_adj(np_blur(X, H) - y, H) / sigma2
    Xn = np.abs(X + gam * (proxGX - X) / lam - gam * gradF + np.sqrt(2 * gam) * Z)
    proxn, _, _, _, _ = np_chambolle(Xn, lam * theta, chambolle_iters)

    r = np_blur(Xn, H) - y
    tv = np_tv(Xn)
    G_t = d / theta - tv
    G_w1 = np.sum(np.real(np.fft.ifft2(dH1 * np.fft.fft2(Xn))) * r) / sigma2
    G_w2 = np.sum(np.real(np.fft.ifft2(dH2 * np.fft.fft2(Xn))) * r) / sigma2
    G_s = np.sum(r**2) / (2 * sigma2**2) - d / (2 * sigma2)

    delta = d_scale * ii ** (-d_exp) / d
    clip = lambda v, box: min(max(v, box[0]), box[1])
    theta_n = clip(theta + c_theta * delta * G_t, boxes["theta"])
    w1_n = clip(true_vals["w1"] if fix["w1"] else w1 - c_w1 * delta * G_w1, boxes["w1"])
    w2_n = clip(true_vals["w2"] if fix["w2"] else w2 - c_w2 * delta * G_w2, boxes["w2"])
    sigma_n = clip(
        sigma_init if fix["sigma"] else sigma2 + c_sigma * delta * G_s, boxes["sigma"]
    )
    logpi = -np.sum(r**2) / (2 * sigma2) - theta * tv
    stats = dict(G_t=G_t, G_w1=G_w1, G_w2=G_w2, G_s=G_s, logPi=logpi, tv=tv)
    return Xn, proxn, theta_n, w1_n, w2_n, sigma_n, stats


# ---------------------------------------------------------------------------
# SALSA (SALSA_v2.m:423-440 with TV initialization, x0 = 0)
# ---------------------------------------------------------------------------

def np_salsa(y, H, tau, mu, max_iter, tol=1e-5, tv_iters=10, x_true=None):
    ATy = np_blur_adj(y, H)
    inv_filter = 1.0 / (np.abs(H) ** 2 + mu)
    invLS = lambda v: np.real(np.fft.ifft2(inv_filter * np.fft.fft2(v)))
    thresh = tau / mu

    x = np.zeros_like(y)
    u = np.zeros_like(y)
    bu = np.zeros_like(y)
    pux = np.zeros_like(y)
    puy = np.zeros_like(y)

    resid = y - np_blur(x, H)
    objective = [0.5 * np.sum(resid**2) + tau * np_tv(u)]
    mses = [np.sum((x - x_true) ** 2) / x.size] if x_true is not None else []
    distance, criterion = [], []
    n_iters = 0
    for outer in range(1, max_iter + 1):
        xprev = x
        u, pux, puy, _, _ = np_chambolle(
            np.real(x - bu), thresh, tv_iters, duals=(pux, puy)
        )
        r = ATy + mu * (u + bu)
        x = invLS(r)
        bu = bu + (u - x)
        resid = y - np_blur(x, H)
        objective.append(0.5 * np.sum(resid**2) + tau * np_tv(u))
        if x_true is not None:
            mses.append(np.sum((x - x_true) ** 2) / x.size)
        distance.append(
            np.linalg.norm(x - u) / np.sqrt(np.sum(x**2) + np.sum(u**2))
        )
        n_iters = outer
        if outer > 1:
            crit = abs(objective[-1] - objective[-2]) / objective[-2]
            criterion.append(crit)
            if crit < tol:
                break
    return dict(
        x=x, objective=np.array(objective), distance=np.array(distance),
        mses=np.array(mses), criterion=np.array(criterion), n_iters=n_iters,
    )


# ---------------------------------------------------------------------------
# Legacy test-signal / trace helpers (SALSA/calctv.m, monotonize.m,
# sparsePWS.m, MakeRDSquares.m) — literal loop ports of the MATLAB math.
# ---------------------------------------------------------------------------

def np_calctv(X):
    dh = np.concatenate([np.diff(X, axis=1), np.zeros((X.shape[0], 1))], axis=1)
    dv = np.concatenate([np.diff(X, axis=0), np.zeros((1, X.shape[1]))], axis=0)
    mag = np.sqrt(dh**2 + dv**2)
    return mag.sum(), mag.max()


def np_monotonize(x):
    y = np.empty_like(np.asarray(x, dtype=float))
    y[0] = x[0]
    offset = 0.0
    for k in range(1, len(x)):
        if x[k] < x[k - 1]:
            offset += x[k - 1] - x[k]
        y[k] = x[k] + offset
    return y


def np_sparse_pws(corners, N, n):
    """corners: (L, 2) int array of MATLAB-style 1-based round(rand*N) draws."""
    x = np.zeros((N, N))
    for xc in corners:
        r0, r1 = max(xc[0], 1), min(xc[0] + n - 1, N)
        c0, c1 = max(xc[1], 1), min(xc[1] + n - 1, N)
        x[r0 - 1:r1, c0 - 1:c1] = 1.0
    return x


def np_rd_squares(draws, N, nbs, dyna):
    """draws: (nbs, 5) uniforms standing in for MATLAB's rand stream."""
    lmin, lmax = 8, N // 4
    x = np.zeros((N, N))
    for u in draws:
        ndx = int(1 + np.floor((N - lmax - 1) * u[0]))
        lx = int(min(N - ndx - 1, np.floor(lmin + (lmax - lmin) * u[1])))
        ndy = int(1 + np.floor((N - lmax - 1) * u[2]))
        ly = int(min(N - ndy - 1, np.floor(lmin + (lmax - lmin) * u[3])))
        x[ndx - 1:ndx + lx - 1, ndy - 1:ndy + ly - 1] = 1 + 10 ** (dyna / 20.0) * u[4]
    ind = x > 0.5
    x[ind] -= x[ind].min()
    x[ind] = x[ind] / x[ind].max() * (10 ** (dyna / 20.0) - 1) + 1
    return x
