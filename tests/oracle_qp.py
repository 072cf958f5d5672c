"""Certified dense QP oracle (NumPy, float64) for golden-value generation.

cvxopt is not installed in this container (SURVEY.md §6), so golden solutions
for the reference's QP (captured via tests/_reference.py) are produced by this
Mehrotra predictor-corrector primal-dual interior-point method and certified
by explicit KKT residual checks (see :func:`kkt_residuals`) — the parity
chain is: reference assembly -> this oracle -> framework ADMM must match.

Solves:  min 1/2 xᵀPx + qᵀx  s.t.  Ax = b,  Gx <= h.
"""

from __future__ import annotations

import numpy as np


def solve_qp_ipm(P, q, G=None, h=None, A=None, b=None, max_iter=50, tol=1e-9):
    """Mehrotra predictor-corrector IPM. Returns (x, info dict)."""
    P = np.asarray(P, float)
    q = np.asarray(q, float).reshape(-1)
    n = q.size
    if G is None:
        G = np.zeros((0, n))
        h = np.zeros(0)
    G = np.asarray(G, float)
    h = np.asarray(h, float).reshape(-1)
    if A is None:
        A = np.zeros((0, n))
        b = np.zeros(0)
    A = np.asarray(A, float)
    b = np.asarray(b, float).reshape(-1)
    m, p = G.shape[0], A.shape[0]

    x = np.zeros(n)
    y = np.zeros(p)
    s = np.maximum(h - G @ x, 1.0)
    z = np.ones(m)

    def solve_newton(W, rd, rp, rg_mod):
        # [P + GᵀWG  Aᵀ][dx]   [-rd - Gᵀ rg_mod]
        # [A          0][dy] = [-rp]
        H = P + G.T @ (W[:, None] * G)
        KKT = np.block([[H, A.T], [A, np.zeros((p, p))]])
        rhs = np.concatenate([-rd - G.T @ rg_mod, -rp])
        # small diagonal regularization for numerical safety
        KKT_reg = KKT + np.diag(np.r_[np.full(n, 1e-12), np.full(p, -1e-12)])
        sol = np.linalg.solve(KKT_reg, rhs)
        return sol[:n], sol[n:]

    info = {"iters": 0, "status": "max_iter"}
    best = (np.inf, x.copy(), y.copy(), z.copy(), s.copy())
    stall = 0
    for it in range(max_iter):
        rd = P @ x + q + A.T @ y + G.T @ z
        rp = A @ x - b
        rg = G @ x + s - h
        mu = (s @ z) / m if m else 0.0
        res = max(
            np.abs(rd).max(initial=0),
            np.abs(rp).max(initial=0),
            np.abs(rg).max(initial=0),
            mu,
        )
        if not np.isfinite(res):
            break
        if res < best[0]:
            best = (res, x.copy(), y.copy(), z.copy(), s.copy())
            stall = 0
        else:
            # iterating past convergence destroys the W = z/s conditioning;
            # bail out on the best iterate
            stall += 1
            if stall >= 3:
                break
        if res < tol:
            info.update(status="optimal", iters=it)
            break

        try:
            step = _ipm_step(P, q, G, A, x, y, s, z, rd, rp, rg, mu, m, solve_newton)
        except np.linalg.LinAlgError:
            break
        if step is None:
            break
        a_p, a_d, dx, ds, dy, dz = step
        x = x + a_p * dx
        s = s + a_p * ds
        y = y + a_d * dy
        z = z + a_d * dz
        info["iters"] = it + 1

    res_final, x, y, z, s = best
    if info["status"] == "max_iter" and res_final < 1e-6:
        info["status"] = "optimal"
    info["x"] = x
    info["y"] = y
    info["z"] = z
    info["s"] = s
    info["residual"] = res_final
    return x, info


def _ipm_step(P, q, G, A, x, y, s, z, rd, rp, rg, mu, m, solve_newton):
    """One Mehrotra predictor-corrector step; returns step sizes+directions."""
    with np.errstate(all="ignore"):
        W = z / s if m else z
        # affine (predictor) direction: rsz = s*z
        rg_mod = (z * rg - s * z) / s if m else np.zeros(0)
        dx_a, dy_a = solve_newton(W, rd, rp, rg_mod)
        ds_a = -rg - G @ dx_a
        dz_a = (-(s * z) - z * ds_a) / s if m else np.zeros(0)

        if m:
            a_p = min(1.0, np.min(-s[ds_a < 0] / ds_a[ds_a < 0])) if np.any(ds_a < 0) else 1.0
            a_d = min(1.0, np.min(-z[dz_a < 0] / dz_a[dz_a < 0])) if np.any(dz_a < 0) else 1.0
            mu_aff = ((s + a_p * ds_a) @ (z + a_d * dz_a)) / m
            sig = (mu_aff / mu) ** 3 if mu > 0 else 0.0
            # corrector: rsz = s*z - sig*mu + ds_a*dz_a
            rsz = s * z - sig * mu + ds_a * dz_a
            rg_mod = (z * rg - rsz) / s
        dx, dy = solve_newton(W, rd, rp, rg_mod)
        ds = -rg - G @ dx
        dz = (-(rsz if m else np.zeros(0)) - z * ds) / s if m else np.zeros(0)

        if m:
            a_p = min(1.0, 0.99 * np.min(-s[ds < 0] / ds[ds < 0])) if np.any(ds < 0) else 1.0
            a_d = min(1.0, 0.99 * np.min(-z[dz < 0] / dz[dz < 0])) if np.any(dz < 0) else 1.0
        else:
            a_p = a_d = 1.0
        for arr in (dx, ds, dy, dz):
            if not np.all(np.isfinite(arr)):
                return None
        return a_p, a_d, dx, ds, dy, dz


def kkt_residuals(x, P, q, G=None, h=None, A=None, b=None, z=None, y=None):
    """Max KKT residual of a candidate solution (certification)."""
    P = np.asarray(P, float)
    q = np.asarray(q, float).reshape(-1)
    res = {}
    rd = P @ x + q
    if A is not None and len(A):
        rd = rd + np.asarray(A).T @ y
        res["eq"] = np.abs(np.asarray(A) @ x - np.asarray(b).reshape(-1)).max()
    if G is not None and len(G):
        rd = rd + np.asarray(G).T @ z
        slack = np.asarray(h).reshape(-1) - np.asarray(G) @ x
        res["ineq_violation"] = max(0.0, -slack.min())
        res["comp"] = np.abs(slack * z).max()
        res["z_neg"] = max(0.0, -z.min())
    res["stationarity"] = np.abs(rd).max()
    return res
