// Dense primal-dual interior-point QP solver (native runtime component).
//
// Fills the role cvxopt's C solver plays in the reference
// (bipedalLocomotionMPC.py:297): a host-side, high-accuracy oracle for
//   min 1/2 x'Px + q'x   s.t.  Gx <= h,  Ax = b
// used for golden-value generation and cross-checking the on-device ADMM
// solver. Mehrotra predictor-corrector with a dense symmetric-indefinite
// KKT solve: UNPIVOTED LDL^T with sign-preserving diagonal regularization
// (the quasi-definite IPM KKT tolerates this; cvxopt regularizes the same
// way).
// Self-contained C++17, no external dependencies; exposed via extern "C"
// for ctypes (see biped_mpc_py_tpu/runtime/native.py).

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

namespace {

using Vec = std::vector<double>;

// Solve S y = r for symmetric S (n x n, row-major) via LDL^T with diagonal
// regularization. S is overwritten. Returns false on breakdown.
bool ldlt_solve(int n, double* S, double* y, const double* r, double reg) {
    for (int i = 0; i < n; ++i) S[i * n + i] += (S[i * n + i] >= 0 ? reg : -reg);
    std::vector<double> d(n);
    // in-place LDL^T (no pivoting; regularization keeps it stable enough for
    // IPM KKT systems, matching cvxopt's KKT-regularization strategy)
    for (int j = 0; j < n; ++j) {
        double dj = S[j * n + j];
        for (int k = 0; k < j; ++k) dj -= S[j * n + k] * S[j * n + k] * d[k];
        if (std::fabs(dj) < 1e-300) return false;
        d[j] = dj;
        for (int i = j + 1; i < n; ++i) {
            double v = S[i * n + j];
            for (int k = 0; k < j; ++k) v -= S[i * n + k] * S[j * n + k] * d[k];
            S[i * n + j] = v / dj;
        }
    }
    // forward solve L z = r
    for (int i = 0; i < n; ++i) {
        double v = r[i];
        for (int k = 0; k < i; ++k) v -= S[i * n + k] * y[k];
        y[i] = v;
    }
    for (int i = 0; i < n; ++i) y[i] /= d[i];
    // backward solve L^T y = z
    for (int i = n - 1; i >= 0; --i) {
        double v = y[i];
        for (int k = i + 1; k < n; ++k) v -= S[k * n + i] * y[k];
        y[i] = v;
    }
    return true;
}

}  // namespace

extern "C" {

// Returns 0 on success (converged), 1 on max-iter with usable solution,
// 2 on numerical failure. info_out: [iters, final_residual, gap].
int qp_solve_dense(
    int n, int m, int p,
    const double* P, const double* q,
    const double* G, const double* h,
    const double* A, const double* b,
    int max_iter, double tol,
    double* x_out, double* y_out, double* z_out, double* info_out) {
    Vec x(n, 0.0), y(p, 0.0), z(m, 1.0), s(m, 1.0);
    // s = max(h - Gx, 1)
    for (int i = 0; i < m; ++i) {
        double gx = 0;
        for (int j = 0; j < n; ++j) gx += G[i * n + j] * x[j];
        s[i] = std::max(h[i] - gx, 1.0);
    }

    const int dim = n + p;
    Vec KKT(dim * dim), Kwork(dim * dim), rhs(dim), sol(dim);
    Vec rd(n), rp(p), rg(m), W(m);
    Vec dx_a(n), dy_a(p), ds_a(m), dz_a(m), dx(n), dy(p), ds(m), dz(m), rsz(m);
    Vec rg_mod(m);
    double best_res = std::numeric_limits<double>::infinity();
    Vec best_x = x, best_y = y, best_z = z;
    int it = 0;
    int stall = 0;

    auto residuals = [&](double& res, double& mu) {
        // rd = Px + q + A'y + G'z ; rp = Ax - b ; rg = Gx + s - h
        for (int i = 0; i < n; ++i) {
            double v = q[i];
            for (int j = 0; j < n; ++j) v += P[i * n + j] * x[j];
            for (int j = 0; j < p; ++j) v += A[j * n + i] * y[j];
            for (int j = 0; j < m; ++j) v += G[j * n + i] * z[j];
            rd[i] = v;
        }
        for (int i = 0; i < p; ++i) {
            double v = -b[i];
            for (int j = 0; j < n; ++j) v += A[i * n + j] * x[j];
            rp[i] = v;
        }
        for (int i = 0; i < m; ++i) {
            double v = s[i] - h[i];
            for (int j = 0; j < n; ++j) v += G[i * n + j] * x[j];
            rg[i] = v;
        }
        mu = 0;
        for (int i = 0; i < m; ++i) mu += s[i] * z[i];
        if (m) mu /= m;
        res = mu;
        for (int i = 0; i < n; ++i) res = std::max(res, std::fabs(rd[i]));
        for (int i = 0; i < p; ++i) res = std::max(res, std::fabs(rp[i]));
        for (int i = 0; i < m; ++i) res = std::max(res, std::fabs(rg[i]));
    };

    auto build_and_solve = [&](const double* rgm, double* ox, double* oy) -> bool {
        // KKT = [[P + G'WG, A'], [A, 0]]
        std::fill(KKT.begin(), KKT.end(), 0.0);
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < n; ++j) KKT[i * dim + j] = P[i * n + j];
        for (int k = 0; k < m; ++k) {
            double w = W[k];
            for (int i = 0; i < n; ++i) {
                double gki = G[k * n + i] * w;
                if (gki == 0.0) continue;
                for (int j = 0; j < n; ++j)
                    KKT[i * dim + j] += gki * G[k * n + j];
            }
        }
        for (int i = 0; i < p; ++i)
            for (int j = 0; j < n; ++j) {
                KKT[(n + i) * dim + j] = A[i * n + j];
                KKT[j * dim + (n + i)] = A[i * n + j];
            }
        for (int i = 0; i < n; ++i) {
            double v = -rd[i];
            for (int k = 0; k < m; ++k) v -= G[k * n + i] * rgm[k];
            rhs[i] = v;
        }
        for (int i = 0; i < p; ++i) rhs[n + i] = -rp[i];
        Kwork = KKT;
        if (!ldlt_solve(dim, Kwork.data(), sol.data(), rhs.data(), 1e-11))
            return false;
        std::memcpy(ox, sol.data(), n * sizeof(double));
        std::memcpy(oy, sol.data() + n, p * sizeof(double));
        return true;
    };

    for (it = 0; it < max_iter; ++it) {
        double res, mu;
        residuals(res, mu);
        if (!std::isfinite(res)) break;
        if (res < best_res) {
            best_res = res;
            best_x = x; best_y = y; best_z = z;
            stall = 0;
        } else if (++stall >= 3) break;
        if (res < tol) break;

        for (int i = 0; i < m; ++i) W[i] = z[i] / s[i];
        // predictor
        for (int i = 0; i < m; ++i) rg_mod[i] = (z[i] * rg[i] - s[i] * z[i]) / s[i];
        if (!build_and_solve(rg_mod.data(), dx_a.data(), dy_a.data())) break;
        for (int i = 0; i < m; ++i) {
            double gdx = 0;
            for (int j = 0; j < n; ++j) gdx += G[i * n + j] * dx_a[j];
            ds_a[i] = -rg[i] - gdx;
            dz_a[i] = (-(s[i] * z[i]) - z[i] * ds_a[i]) / s[i];
        }
        double ap = 1.0, ad = 1.0;
        for (int i = 0; i < m; ++i) {
            if (ds_a[i] < 0) ap = std::min(ap, -s[i] / ds_a[i]);
            if (dz_a[i] < 0) ad = std::min(ad, -z[i] / dz_a[i]);
        }
        double mu_aff = 0;
        for (int i = 0; i < m; ++i)
            mu_aff += (s[i] + ap * ds_a[i]) * (z[i] + ad * dz_a[i]);
        if (m) mu_aff /= m;
        double sig = (mu > 0) ? std::pow(mu_aff / mu, 3.0) : 0.0;
        // corrector
        for (int i = 0; i < m; ++i) {
            rsz[i] = s[i] * z[i] - sig * mu + ds_a[i] * dz_a[i];
            rg_mod[i] = (z[i] * rg[i] - rsz[i]) / s[i];
        }
        if (!build_and_solve(rg_mod.data(), dx.data(), dy.data())) break;
        for (int i = 0; i < m; ++i) {
            double gdx = 0;
            for (int j = 0; j < n; ++j) gdx += G[i * n + j] * dx[j];
            ds[i] = -rg[i] - gdx;
            dz[i] = (-rsz[i] - z[i] * ds[i]) / s[i];
        }
        ap = 1.0; ad = 1.0;
        for (int i = 0; i < m; ++i) {
            if (ds[i] < 0) ap = std::min(ap, 0.99 * -s[i] / ds[i]);
            if (dz[i] < 0) ad = std::min(ad, 0.99 * -z[i] / dz[i]);
        }
        ap = std::min(ap, 1.0); ad = std::min(ad, 1.0);
        bool finite = true;
        for (int i = 0; i < n && finite; ++i) finite = std::isfinite(dx[i]);
        for (int i = 0; i < m && finite; ++i)
            finite = std::isfinite(ds[i]) && std::isfinite(dz[i]);
        if (!finite) break;
        for (int i = 0; i < n; ++i) x[i] += ap * dx[i];
        for (int i = 0; i < m; ++i) s[i] += ap * ds[i];
        for (int i = 0; i < p; ++i) y[i] += ad * dy[i];
        for (int i = 0; i < m; ++i) z[i] += ad * dz[i];
    }

    std::memcpy(x_out, best_x.data(), n * sizeof(double));
    if (p) std::memcpy(y_out, best_y.data(), p * sizeof(double));
    if (m) std::memcpy(z_out, best_z.data(), m * sizeof(double));
    info_out[0] = it;
    info_out[1] = best_res;
    info_out[2] = 0.0;
    if (!std::isfinite(best_res)) return 2;
    return best_res < tol ? 0 : (best_res < 1e-6 ? 1 : 2);
}

}  // extern "C"
