// Native dense tier: small dense complex eigen-machinery for the host side
// of the Krylov-Schur solver.
//
// The reference reaches this functionality through LAPACK (zgees at
// krylov_schur.py:69, ztrexc at utils.py:24-29, zgeev at decomposition.py:120
// of /root/reference) one Python->Fortran call at a time; the greedy Schur
// reordering there is O(m^2) separate ztrexc round-trips (utils.py:45-63).
// Here the whole tier is self-contained C++ (no LAPACK dependency):
//
//   * schur_z        — complex Schur via Householder Hessenberg reduction +
//                      Wilkinson-shifted QR iteration with deflation
//   * trexc_z        — move a diagonal entry by adjacent unitary swaps
//   * ordered_schur_z— the full greedy reorder loop in ONE native call
//   * trevc_z        — eigenvectors of triangular T by back-substitution
//   * eig_z          — full eigendecomposition (schur + trevc + rotate)
//
// Matrices are row-major (C/NumPy default), complex128 as double pairs.
// Everything is O(m^3) with m <= a few hundred: host-tier sizes.

#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

using cd = std::complex<double>;

namespace {

inline cd &at(cd *A, int n, int i, int j) { return A[(size_t)i * n + j]; }

// Apply a 2x2 unitary U = [[u00,u01],[u10,u11]] on the LEFT to rows (r, r+1)
// of A restricted to columns [c0, c1):  rows <- U * rows.
void rot_rows(cd *A, int n, int r, int c0, int c1, cd u00, cd u01, cd u10,
              cd u11) {
  for (int j = c0; j < c1; ++j) {
    cd x = at(A, n, r, j), y = at(A, n, r + 1, j);
    at(A, n, r, j) = u00 * x + u01 * y;
    at(A, n, r + 1, j) = u10 * x + u11 * y;
  }
}

// Apply U on the RIGHT to columns (c, c+1) of A restricted to rows [r0, r1):
// cols <- cols * U.
void rot_cols(cd *A, int n, int c, int r0, int r1, cd u00, cd u01, cd u10,
              cd u11) {
  for (int i = r0; i < r1; ++i) {
    cd x = at(A, n, i, c), y = at(A, n, i, c + 1);
    at(A, n, i, c) = x * u00 + y * u10;
    at(A, n, i, c + 1) = x * u01 + y * u11;
  }
}

// Givens rotation zeroing g: G * [f; g] = [r; 0] with
// G = [[conj(c_)/|.|... ]] — returns c (real>=0 convention relaxed) and s
// such that [[c, s], [-conj(s), conj(c)]] * [f; g] = [r; 0].
// x / |x| computed safely: denormal x is upscaled by an exact power of two
// first (denormal/denormal division loses mantissa bits and can destroy the
// unit-modulus property, which would make the Givens rotation non-unitary).
inline cd safe_phase(cd x, double ax) {
  if (ax < 1e-290) {
    x *= 0x1p600;
    ax = std::abs(x);
  }
  return x / ax;
}

void zlartg(cd f, cd g, cd &c, cd &s) {
  double af = std::abs(f), ag = std::abs(g);
  if (ag == 0.0) {
    c = 1.0;
    s = 0.0;
    return;
  }
  if (af == 0.0) {
    c = 0.0;
    s = std::conj(safe_phase(g, ag));
    return;
  }
  double d = std::hypot(af, ag);  // overflow/underflow-safe modulus
  c = af / d;
  s = safe_phase(f, af) * std::conj(safe_phase(g, ag)) * (ag / d);
}

}  // namespace

// Debug/diagnostic counters (read via dense_tier_stats).
static long g_rotations = 0;
static double g_worst_g = 0.0;
static long g_outer_iters = 0;

extern "C" {

void dense_tier_stats(long *rotations, double *worst_g, long *outer_iters) {
  *rotations = g_rotations;
  *worst_g = g_worst_g;
  *outer_iters = g_outer_iters;
}

void dense_tier_stats_reset() {
  g_rotations = 0;
  g_worst_g = 0.0;
  g_outer_iters = 0;
}

// Reduce A (n x n, row-major) to upper Hessenberg form in place, accumulating
// the orthogonal similarity into Q (Q must hold identity or any unitary to
// compose with on entry? -- contract: Q_out is OVERWRITTEN with the
// accumulated transform, callers pass an uninitialized buffer).
// A_out = Q^H A_in Q with A_out Hessenberg.
void hessenberg_z(int n, cd *A, cd *Q) {
  // Q <- I
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) at(Q, n, i, j) = (i == j) ? 1.0 : 0.0;

  std::vector<cd> v((size_t)n);
  for (int k = 0; k < n - 2; ++k) {
    // Householder vector for column k, rows k+1..n-1
    double xnorm = 0.0;
    for (int i = k + 1; i < n; ++i) xnorm += std::norm(at(A, n, i, k));
    xnorm = std::sqrt(xnorm);
    if (xnorm == 0.0) continue;
    cd x0 = at(A, n, k + 1, k);
    double ax0 = std::abs(x0);
    cd phase = (ax0 == 0.0) ? cd(1.0) : x0 / ax0;
    cd alpha = -phase * xnorm;  // target value of A[k+1,k]
    // v = x - alpha*e1 ; normalize
    double vnorm2 = 0.0;
    for (int i = k + 1; i < n; ++i) {
      v[i] = at(A, n, i, k);
      if (i == k + 1) v[i] -= alpha;
      vnorm2 += std::norm(v[i]);
    }
    if (vnorm2 == 0.0) continue;
    // P = I - 2 v v^H / |v|^2 ; apply: A <- P A P, Q <- Q P
    double inv = 2.0 / vnorm2;
    // A <- P A  (rows k+1..n-1, all cols)
    for (int j = 0; j < n; ++j) {
      cd dot = 0.0;
      for (int i = k + 1; i < n; ++i) dot += std::conj(v[i]) * at(A, n, i, j);
      dot *= inv;
      for (int i = k + 1; i < n; ++i) at(A, n, i, j) -= v[i] * dot;
    }
    // A <- A P  (all rows, cols k+1..n-1)
    for (int i = 0; i < n; ++i) {
      cd dot = 0.0;
      for (int j = k + 1; j < n; ++j) dot += at(A, n, i, j) * v[j];
      dot *= inv;
      for (int j = k + 1; j < n; ++j) at(A, n, i, j) -= dot * std::conj(v[j]);
    }
    // Q <- Q P
    for (int i = 0; i < n; ++i) {
      cd dot = 0.0;
      for (int j = k + 1; j < n; ++j) dot += at(Q, n, i, j) * v[j];
      dot *= inv;
      for (int j = k + 1; j < n; ++j) at(Q, n, i, j) -= dot * std::conj(v[j]);
    }
    // clean the annihilated entries
    at(A, n, k + 1, k) = alpha;
    for (int i = k + 2; i < n; ++i) at(A, n, i, k) = 0.0;
  }
}

// Complex Schur of an upper-Hessenberg H (in place -> T), accumulating the
// rotations into Q (Q is pre-filled by the caller; pass identity for a fresh
// factorization or the Hessenberg transform to compose).
// Returns 0 on success, >0 if the QR iteration failed to converge.
int hess_schur_z(int n, cd *T, cd *Q, int max_sweeps) {
  if (max_sweeps <= 0) max_sweeps = 40 * n + 100;
  const double eps = 2.220446049250313e-16;
  // Absolute deflation floor: discarding subdiagonals below eps*||T|| is
  // backward-stable and prevents the iteration from chasing (de)normal dust
  // in graded/nilpotent matrices whose neighbouring diagonal entries vanish.
  double anorm = 0.0;
  for (int i = 0; i < n; ++i)
    for (int j = (i > 0 ? i - 1 : 0); j < n; ++j)
      anorm = std::max(anorm, std::abs(at(T, n, i, j)));
  const double floor_tol = eps * anorm;
  int hi = n - 1;
  int sweeps_at_hi = 0;
  int total = 0;
  while (hi > 0) {
    ++g_outer_iters;
    if (++total > max_sweeps * 4 + 1000) return 1;
    // deflate negligible subdiagonals in the active window
    int lo = hi;
    while (lo > 0) {
      double s = std::abs(at(T, n, lo - 1, lo - 1)) + std::abs(at(T, n, lo, lo));
      double thresh = std::max(eps * s, floor_tol);
      if (std::abs(at(T, n, lo, lo - 1)) <= thresh) {
        at(T, n, lo, lo - 1) = 0.0;
        break;
      }
      --lo;
    }
    if (lo == hi) {  // 1x1 deflated
      --hi;
      sweeps_at_hi = 0;
      continue;
    }
    // Wilkinson shift from trailing 2x2 of the window
    cd a = at(T, n, hi - 1, hi - 1), b = at(T, n, hi - 1, hi);
    cd c = at(T, n, hi, hi - 1), d = at(T, n, hi, hi);
    cd tr2 = (a + d) * 0.5;
    cd disc = std::sqrt(tr2 * tr2 - (a * d - b * c));
    cd mu1 = tr2 + disc, mu2 = tr2 - disc;
    cd mu = (std::abs(mu1 - d) < std::abs(mu2 - d)) ? mu1 : mu2;
    if (++sweeps_at_hi % 12 == 0) {
      // exceptional shift to break cycles
      mu = d + cd(1.5 * std::abs(at(T, n, hi, hi - 1)), 0.0);
    }
    if (sweeps_at_hi > max_sweeps) return 2;
    // Implicit single-shift QR sweep on window [lo, hi] via bulge chasing.
    for (int k = lo; k < hi; ++k) {
      cd f, g;
      if (k == lo) {
        f = at(T, n, lo, lo) - mu;
        g = at(T, n, lo + 1, lo);
      } else {
        f = at(T, n, k, k - 1);      // Hessenberg entry
        g = at(T, n, k + 1, k - 1);  // the bulge to annihilate
      }
      cd cs, sn;
      zlartg(f, g, cs, sn);
      // G = [[c, s], [-conj(s), c]] with c real: G [f; g] = [r; 0]
      cd g00 = cs, g01 = sn, g10 = -std::conj(sn), g11 = cs;
      ++g_rotations;
      g_worst_g = std::max(
          g_worst_g, std::abs(std::norm(cs) + std::norm(sn) - 1.0));
      int c0 = (k > lo) ? k - 1 : lo;
      rot_rows(T, n, k, c0, n, g00, g01, g10, g11);
      if (k > lo) at(T, n, k + 1, k - 1) = 0.0;  // rotated to zero exactly
      // right-multiply T and Q by G^H on columns k, k+1
      cd h00 = std::conj(g00), h01 = std::conj(g10);
      cd h10 = std::conj(g01), h11 = std::conj(g11);
      int rend = std::min(k + 3, hi + 1);  // row k+2 acquires the new bulge
      rot_cols(T, n, k, 0, rend, h00, h01, h10, h11);
      rot_cols(Q, n, k, 0, n, h00, h01, h10, h11);
    }
  }
  // zero the strictly-lower triangle (numerical dust)
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < i; ++j) at(T, n, i, j) = 0.0;
  return 0;
}

// Full complex Schur A = Q T Q^H. A is overwritten with T.
int schur_z(int n, cd *A, cd *Q) {
  hessenberg_z(n, A, Q);
  return hess_schur_z(n, A, Q, 0);
}

// Swap adjacent diagonal entries k and k+1 of triangular T by a unitary
// similarity; update Q (right-multiply). Exact analogue of one ztrexc step.
static void swap_adjacent(int n, cd *T, cd *Q, int k) {
  cd t11 = at(T, n, k, k), t12 = at(T, n, k, k + 1);
  cd t22 = at(T, n, k + 1, k + 1);
  // Rotation from the eigenvector [t12; t22-t11] of the 2x2 block for t22.
  cd f = t12, g = t22 - t11;
  if (std::abs(g) == 0.0) return;  // equal eigenvalues: nothing to move
  cd cs, sn;
  // We need U with first column prop to [f; g]: build from zlartg(f, g):
  // [[c, s], [-conj(s), c]] [f; g] = [r; 0]  =>  U = G^H has first column
  // [conj(c); conj(s)] ... work it directly instead:
  double nrm = std::sqrt(std::norm(f) + std::norm(g));
  cd u00 = f / nrm, u10 = g / nrm;           // first column = normalized [f;g]
  cd u01 = -std::conj(u10), u11 = std::conj(u00);  // orthonormal complement
  // T <- U^H T U on rows/cols k, k+1 ; Q <- Q U
  cd h00 = std::conj(u00), h01 = std::conj(u10);
  cd h10 = std::conj(u01), h11 = std::conj(u11);
  rot_rows(T, n, k, 0, n, h00, h01, h10, h11);
  rot_cols(T, n, k, 0, n, u00, u01, u10, u11);
  rot_cols(Q, n, k, 0, n, u00, u01, u10, u11);
  // enforce exact triangularity of the swapped block
  at(T, n, k + 1, k) = 0.0;
  (void)cs;
  (void)sn;
}

// Move diagonal entry ifst to position ilst (0-based) via adjacent swaps.
int trexc_z(int n, cd *T, cd *Q, int ifst, int ilst) {
  if (ifst < 0 || ilst < 0 || ifst >= n || ilst >= n) return -1;
  if (ifst < ilst)
    for (int k = ifst; k < ilst; ++k) swap_adjacent(n, T, Q, k);
  else
    for (int k = ifst - 1; k >= ilst; --k) swap_adjacent(n, T, Q, k);
  return 0;
}

// Greedy reorder: order[t] gives, for each target position t, the index (in
// the ORIGINAL diagonal) of the eigenvalue that should end up at t.  This is
// the entire loop of the reference's ordered_schur (utils.py:45-63) in one
// native call with position tracking.
int ordered_schur_z(int n, cd *T, cd *Q, const int *order) {
  std::vector<int> pos((size_t)n);  // current position of original index i
  for (int i = 0; i < n; ++i) pos[i] = i;
  std::vector<int> at_pos((size_t)n);  // original index currently at position
  for (int i = 0; i < n; ++i) at_pos[i] = i;
  for (int target = 0; target < n; ++target) {
    int orig = order[target];
    int source = pos[orig];
    if (source == target) continue;
    int rc = trexc_z(n, T, Q, source, target);
    if (rc != 0) return rc;
    // entry moved from 'source' to 'target'; everything in [target, source)
    // shifted one to the right
    for (int p = source; p > target; --p) {
      at_pos[p] = at_pos[p - 1];
      pos[at_pos[p]] = p;
    }
    at_pos[target] = orig;
    pos[orig] = target;
  }
  return 0;
}

// Right eigenvectors of upper-triangular T by back-substitution; S is n x n
// output (unit-norm columns). Mirrors LAPACK ztrevc's safeguarded solve.
int trevc_z(int n, const cd *T, cd *S) {
  const double eps = 2.220446049250313e-16;
  double scale = 1.0;
  for (int i = 0; i < n; ++i)
    scale = std::max(scale, std::abs(T[(size_t)i * n + i]));
  for (int k = 0; k < n; ++k) {
    std::vector<cd> y((size_t)k + 1);
    y[k] = 1.0;
    cd lam = T[(size_t)k * n + k];
    for (int i = k - 1; i >= 0; --i) {
      cd rhs = 0.0;
      for (int j = i + 1; j <= k; ++j) rhs -= T[(size_t)i * n + j] * y[j];
      cd d = T[(size_t)i * n + i] - lam;
      if (std::abs(d) < eps * scale)
        d = cd((d.real() < 0 ? -1.0 : 1.0) * eps * scale, 0.0);
      y[i] = rhs / d;
    }
    double nrm = 0.0;
    for (int i = 0; i <= k; ++i) nrm += std::norm(y[i]);
    nrm = std::sqrt(nrm);
    for (int i = 0; i < n; ++i)
      S[(size_t)i * n + k] = (i <= k) ? y[i] / nrm : cd(0.0);
  }
  return 0;
}

// Full eigendecomposition of a small complex matrix: values + unit-norm
// right eigenvectors (vecs = Q @ trevc(T)).
int eig_z(int n, cd *A, cd *vals, cd *vecs) {
  std::vector<cd> Q((size_t)n * n);
  int rc = schur_z(n, A, Q.data());
  if (rc != 0) return rc;
  std::vector<cd> S((size_t)n * n);
  trevc_z(n, A, S.data());
  for (int i = 0; i < n; ++i) vals[i] = A[(size_t)i * n + i];
  // vecs = Q * S
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      cd acc = 0.0;
      for (int k = 0; k < n; ++k)
        acc += Q[(size_t)i * n + k] * S[(size_t)k * n + j];
      vecs[(size_t)i * n + j] = acc;
    }
  return 0;
}

}  // extern "C"
