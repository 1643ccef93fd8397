import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vplines_slam_tpu.solver import lm as lm_mod
from vplines_slam_tpu.solver import marginalization as marg_mod
from vplines_slam_tpu.factors import residuals as res
from vplines_slam_tpu.utils import geometry as geo


def test_lm_dense_curve_fit():
    """Nonlinear LSQ: fit y = a*exp(-b*t) with LM, dense only."""
    t = jnp.linspace(0, 2, 50)
    a_true, b_true = 2.5, 1.3
    y = a_true * jnp.exp(-b_true * t)

    def residual(x):
        return x[0] * jnp.exp(-x[1] * t) - y

    def retract(x, d):
        return x + d

    spec = lm_mod.SchurSpec(dense_dim=2)
    out = lm_mod.lm_solve(
        residual, retract, jnp.asarray([1.0, 0.0]), spec,
        lm_mod.LMConfig(num_iters=20),
    )
    np.testing.assert_allclose(out.x, [a_true, b_true], atol=1e-8)
    assert float(out.cost) < 1e-16


def test_lm_schur_mini_ba():
    """One moving camera pose + 12 scalar inverse depths, Schur-eliminated.

    Anchor camera at identity; second pose unknown; observations exact.
    """
    rng = np.random.default_rng(3)
    n_pts = 12
    X = rng.uniform([-1, -1, 3], [1, 1, 6], size=(n_pts, 3))
    q_true = geo.so3_exp_quat(jnp.asarray([0.04, -0.06, 0.03]))
    p_true = jnp.asarray([0.3, -0.1, 0.05])

    obs_i = jnp.asarray(X / X[:, 2:3])  # anchor frame rays (z=1)
    inv_dep_true = jnp.asarray(1.0 / X[:, 2])

    q_cw, p_cw = geo.pose_inverse(q_true, p_true)
    Xc = jax.vmap(lambda x: geo.transform_point(q_cw, p_cw, jnp.asarray(x)))(jnp.asarray(X))
    obs_j = Xc / Xc[:, 2:3]

    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    zero3 = jnp.zeros(3)

    def residual(x):
        q, p, invd = x
        r = jax.vmap(
            lambda oi, oj, d: res.point_reprojection(
                zero3, ident, p, q, zero3, ident, d, oi, oj
            )
        )(obs_i, obs_j, invd)
        return r.reshape(-1) * res.POINT_SQRT_INFO

    def retract(x, delta):
        q, p, invd = x
        dq = geo.so3_exp_quat(delta[0:3])
        return (
            geo.quat_normalize(geo.quat_mul(q, dq)),
            p + delta[3:6],
            invd + delta[6:],
        )

    # start from a perturbed-truth init (BA refines what the initializer
    # provides; cold-start from zero translation is a known local minimum)
    q0 = geo.quat_mul(q_true, geo.so3_exp_quat(jnp.asarray([0.02, -0.01, 0.015])))
    p0 = p_true + jnp.asarray([0.05, -0.04, 0.03])
    d0 = inv_dep_true * (1.0 + 0.15 * jnp.asarray(rng.standard_normal(n_pts)))
    x0 = (q0, p0, d0)
    spec = lm_mod.SchurSpec(dense_dim=6, n_scalar=n_pts)
    out = lm_mod.lm_solve(residual, retract, x0, spec, lm_mod.LMConfig(num_iters=25))
    q_est, p_est, invd_est = out.x
    # monocular scale gauge is free: compare translation direction + scaled depths
    s = float(jnp.linalg.norm(p_true) / jnp.linalg.norm(p_est))
    np.testing.assert_allclose(p_est * s, p_true, atol=1e-6)
    np.testing.assert_allclose(invd_est / s, inv_dep_true, rtol=1e-5)
    qd = geo.quat_mul(geo.quat_conj(q_est), q_true)
    assert abs(float(qd[0])) > 1 - 1e-9


def test_lm_with_block4_landmarks():
    """Dense block + 4-dof blocks exercise the block-Schur path: quadratic
    problem with known solution."""
    rng = np.random.default_rng(5)
    D, L = 6, 3
    N = D + 4 * L
    # each row touches the dense block and exactly one landmark 4-block
    # (the structure BA produces; Schur assumes block-diagonal Hll)
    A = np.zeros((40, N))
    for i in range(40):
        A[i, :D] = rng.standard_normal(D)
        s = D + 4 * (i % L)
        A[i, s : s + 4] = rng.standard_normal(4)
    A = jnp.asarray(A)
    x_true = jnp.asarray(rng.standard_normal(N))
    y = A @ x_true

    residual = lambda x: A @ x - y
    retract = lambda x, d: x + d
    spec = lm_mod.SchurSpec(dense_dim=D, n_scalar=0, n_block4=L)
    out = lm_mod.lm_solve(residual, retract, jnp.zeros(N), spec, lm_mod.LMConfig(num_iters=12))
    np.testing.assert_allclose(out.x, x_true, atol=1e-7)


def test_schur_solve_matches_dense():
    rng = np.random.default_rng(8)
    spec = lm_mod.SchurSpec(dense_dim=5, n_scalar=4, n_block4=2)
    N = spec.total_dim
    A = rng.standard_normal((3 * N, N))
    # landmark-landmark coupling must be block-diagonal for Schur validity:
    # build H from a jacobian where each landmark column group never co-occurs
    # with another landmark group in the same row.
    J = np.zeros((60, N))
    for i in range(60):
        J[i, :5] = rng.standard_normal(5)
        lm = i % 6
        if lm < 4:
            J[i, 5 + lm] = rng.standard_normal()
        else:
            s = 9 + 4 * (lm - 4)
            J[i, s : s + 4] = rng.standard_normal(4)
    J = jnp.asarray(J)
    H = J.T @ J
    g = jnp.asarray(rng.standard_normal(N))
    lam = 1e-3
    delta = lm_mod.schur_solve(H, g, spec, jnp.asarray(lam), diag_floor=0.0)
    Hd = H + jnp.diag(lam * jnp.diag(H))
    delta_ref = jnp.linalg.solve(Hd, g)
    np.testing.assert_allclose(delta, delta_ref, atol=1e-8)


def test_marginalize_gaussian_exact():
    """Marginalizing x1 from a joint Gaussian must reproduce the exact
    marginal information on x2 (textbook Schur complement)."""
    rng = np.random.default_rng(11)
    n1, n2 = 3, 4
    J = jnp.asarray(rng.standard_normal((20, n1 + n2)))
    r = jnp.asarray(rng.standard_normal(20))
    mask = jnp.asarray([True] * n1 + [False] * n2)

    Jp, rp = marg_mod.marginalize(J, r, mask)
    # prior info = JpᵀJp restricted to kept block
    H_prior = (Jp.T @ Jp)[n1:, n1:]
    H = np.asarray(J.T @ J)
    H_marg = H[n1:, n1:] - H[n1:, :n1] @ np.linalg.inv(H[:n1, :n1]) @ H[:n1, n1:]
    np.testing.assert_allclose(H_prior, H_marg, atol=1e-8)
    # dropped columns are exactly zero
    np.testing.assert_allclose(np.asarray(Jp)[:, :n1], 0.0, atol=1e-10)
    # gradient matches: Jpᵀ rp == b_schur
    b = np.asarray(J.T @ r)
    b_marg = b[n1:] - H[n1:, :n1] @ np.linalg.inv(H[:n1, :n1]) @ b[:n1]
    np.testing.assert_allclose(np.asarray(Jp.T @ rp)[n1:], b_marg, atol=1e-8)


def test_prior_replay_recovers_map():
    """Solving [prior from marginalization] + [new factor] must equal solving
    the full joint problem — the defining property of marginalization."""
    rng = np.random.default_rng(13)
    n1, n2 = 2, 3
    N = n1 + n2
    J_all = jnp.asarray(rng.standard_normal((15, N)))
    r_all = jnp.asarray(rng.standard_normal(15))

    # full MAP solution
    x_map = jnp.linalg.lstsq(J_all, -r_all)[0]

    # marginalize x1 (linear problem → linearization point 0)
    mask = jnp.asarray([True] * n1 + [False] * n2)
    Jp, rp = marg_mod.marginalize(J_all, r_all, mask)

    # MAP of x2 from the prior alone
    x2_map = jnp.linalg.lstsq(Jp[:, n1:], -rp)[0]
    np.testing.assert_allclose(x2_map, x_map[n1:], atol=1e-8)


def test_shift_prior_permutes_columns():
    prior = marg_mod.Prior(
        J=jnp.arange(16.0).reshape(4, 4), r0=jnp.zeros(4), valid=jnp.asarray(True)
    )
    perm = jnp.asarray([2, 3, -1, -1])  # new slots 0,1 <- old 2,3; rest dropped
    shifted = marg_mod.shift_prior(prior, perm)
    np.testing.assert_allclose(shifted.J[:, 0], prior.J[:, 2])
    np.testing.assert_allclose(shifted.J[:, 1], prior.J[:, 3])
    np.testing.assert_allclose(shifted.J[:, 2:], 0.0)


def test_lm_solve_jits():
    t = jnp.linspace(0, 1, 20)
    y = 2.0 * t + 1.0

    def go(y):
        out = lm_mod.lm_solve(
            lambda x: x[0] * t + x[1] - y,
            lambda x, d: x + d,
            jnp.zeros(2),
            lm_mod.SchurSpec(dense_dim=2),
        )
        return out.x

    x = jax.jit(go)(y)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-9)


def test_marginalize_window_matches_generic():
    """The structured fast path (arrow factorization) must produce the SAME
    prior information as the generic eigen-clip marginalization on a
    well-posed window-shaped problem, and its row layout must survive the
    [:nd] crop losslessly (the generic path's ascending-eigh rows do not)."""
    rng = np.random.default_rng(5)
    nd, n_pts, n_lns = 12, 6, 2
    N = nd + n_pts + 4 * n_lns
    rows = []
    # dense factors over all dense dims
    Jd = rng.standard_normal((3 * nd, N))
    Jd[:, nd:] = 0.0
    rows.append(Jd)
    # per-point factors: couple one point dim to a few dense dims (arrow)
    for i in range(n_pts):
        Jp_ = np.zeros((4, N))
        Jp_[:, : nd] = rng.standard_normal((4, nd)) * 0.3
        Jp_[:, nd + i] = rng.standard_normal(4)
        rows.append(Jp_)
    # per-line factors: couple one 4-block to dense dims
    for i in range(n_lns):
        Jl = np.zeros((8, N))
        Jl[:, : nd] = rng.standard_normal((8, nd)) * 0.3
        Jl[:, nd + n_pts + 4 * i : nd + n_pts + 4 * (i + 1)] = (
            rng.standard_normal((8, 4))
        )
        rows.append(Jl)
    J = jnp.asarray(np.concatenate(rows, axis=0))
    r = jnp.asarray(rng.standard_normal(J.shape[0]))

    mask = jnp.asarray([True] * 3 + [False] * (nd - 3) + [True] * (N - nd))
    Jg, rg = marg_mod.marginalize(J, r, mask)
    Jw, rw = marg_mod.marginalize_window(
        J, r, nd, dense_start=0, dense_size=3, n_points=n_pts, n_lines=n_lns
    )
    # same information content and gradient
    np.testing.assert_allclose(
        np.asarray(Jw.T @ Jw), np.asarray(Jg.T @ Jg), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(Jw.T @ rw), np.asarray(Jg.T @ rg), atol=1e-8
    )
    # structured rows live at the kept dims: the [:nd] crop loses nothing
    Jc, rc = Jw[:nd, :nd], rw[:nd]
    np.testing.assert_allclose(
        np.asarray(Jc.T @ Jc), np.asarray((Jw.T @ Jw)[:nd, :nd]), atol=1e-10
    )
    assert np.linalg.matrix_rank(np.asarray(Jc), tol=1e-8) == nd - 3

def test_marginalization_near_singular():
    """Documents the accepted divergence of marginalize_window's per-block
    eigen-clip vs the generic joint clip when an eliminated landmark block is
    near-singular (see the APPROXIMATION NOTE in marginalize_window): both
    paths must zero the unobservable direction (bounded prior), and they must
    agree on the well-observed subspace even though the clipped basis differs.
    """
    rng = np.random.default_rng(11)
    nd, n_pts = 8, 3
    N = nd + n_pts
    Jd = rng.standard_normal((2 * nd, N))
    Jd[:, nd:] = 0.0
    rows = [Jd]
    for i in range(n_pts):
        Jp_ = np.zeros((3, N))
        Jp_[:, :nd] = rng.standard_normal((3, nd)) * 0.3
        # point 0: essentially unobserved depth (zero-parallax track)
        Jp_[:, nd + i] = rng.standard_normal(3) * (1e-7 if i == 0 else 1.0)
        rows.append(Jp_)
    J = jnp.asarray(np.concatenate(rows, axis=0))
    r = jnp.asarray(rng.standard_normal(J.shape[0]))
    mask = jnp.asarray([True] * 2 + [False] * (nd - 2) + [True] * n_pts)

    Jg, rg = marg_mod.marginalize(J, r, mask)
    Jw, rw = marg_mod.marginalize_window(
        J, r, nd, dense_start=0, dense_size=2, n_points=n_pts, n_lines=0
    )
    Hg = np.asarray(Jg.T @ Jg)
    Hw = np.asarray(Jw.T @ Jw)
    # neither prior blows up on the near-singular direction
    assert np.isfinite(Hg).all() and np.isfinite(Hw).all()
    assert np.linalg.norm(Hw) < 1e4 and np.linalg.norm(Hg) < 1e4
    # they agree to a loose tolerance: the divergence is O(clip threshold),
    # not O(1) — this is the accepted approximation, quantified
    scale = max(np.linalg.norm(Hg), 1.0)
    assert np.linalg.norm(Hw - Hg) / scale < 1e-3


def test_project_out_nullspace_exact_on_kept_subspace():
    """r5: the gauge projection must (a) kill injected f32-style spurious
    stiffness along the nullspace basis, (b) stay EXACT when the basis has
    rows on just-eliminated dims (zero prior columns) — the QR-of-full-basis
    variant left ~1/nf of the kept-subspace component and wrote nonzero
    entries into eliminated columns (r4 advisor finding)."""
    rng = np.random.default_rng(5)
    n, nb = 24, 4
    # prior with zero columns on dims 0..5 (an eliminated frame)
    J = rng.standard_normal((n, n))
    J[:, 0:6] = 0.0
    # nullspace basis with nonzero rows everywhere (like gauge_nullspace)
    Nb = rng.standard_normal((n, nb))
    # inject spurious stiffness along the kept-subspace component of Nb
    keep = np.ones(n, bool)
    keep[0:6] = False
    Nk = Nb * keep[:, None]
    Nk_orth, _ = np.linalg.qr(Nk)
    J_noisy = J + 0.1 * rng.standard_normal((n, nb)) @ Nk_orth.T

    Jp = np.asarray(
        marg_mod.project_out_nullspace(jnp.asarray(J_noisy), jnp.asarray(Nb))
    )
    # (a) no information left along the kept-subspace gauge directions
    assert np.linalg.norm(Jp @ Nk) < 1e-10 * max(np.linalg.norm(Jp), 1.0)
    # (b) eliminated columns stay (numerically) untouched: the projector
    # writes nothing beyond the O(ulp) dust the inputs already carried
    assert np.abs(Jp[:, 0:6]).max() < 1e-12
    # (c) information orthogonal to the gauge is untouched
    P = np.eye(n) - Nk_orth @ Nk_orth.T
    np.testing.assert_allclose(Jp @ P, J_noisy @ P, atol=1e-10)


def test_project_out_nullspace_drops_annihilated_basis_columns():
    """A basis column living entirely on eliminated dims must drop out (the
    SVD mask) instead of polluting the projector with junk directions."""
    rng = np.random.default_rng(6)
    n = 12
    J = rng.standard_normal((n, n))
    J[:, 0:3] = 0.0
    Nb = np.zeros((n, 2))
    Nb[0:3, 0] = rng.standard_normal(3)  # entirely on eliminated dims
    Nb[3:, 1] = rng.standard_normal(n - 3)  # entirely on kept dims
    Jp = np.asarray(
        marg_mod.project_out_nullspace(jnp.asarray(J), jnp.asarray(Nb))
    )
    u = Nb[:, 1] / np.linalg.norm(Nb[:, 1])
    assert np.linalg.norm(Jp @ u) < 1e-10 * max(np.linalg.norm(Jp), 1.0)
    # the annihilated column must NOT have removed anything: project J onto
    # the complement of u and compare
    P = np.eye(n) - np.outer(u, u)
    np.testing.assert_allclose(Jp, J @ P, atol=1e-10)


def test_lm_solve_window_matches_generic():
    """r5: the structured window linearizer (nd+5 jvps + block Schur) must
    reproduce the generic dense-jacfwd lm_solve on a real window problem —
    same iterates, costs and deltas to FP-reassociation tolerance."""
    import jax

    from vplines_slam_tpu.estimator import window as win_mod
    from vplines_slam_tpu.utils import demo

    cfg = win_mod.WindowConfig(max_points=24, max_lines=6, max_imu=8,
                               window=4, line_min_obs=3)
    state, data, params = demo.synthetic_window(
        cfg, n_landmarks=60, imu_per_interval=8, perturb=0.02, n_lines=8,
    )
    x0 = (state, data.pt_inv_depth, data.ln_orth)
    weights = win_mod.ResidualWeights()
    res_fn = lambda x: win_mod.window_residuals(x, data, cfg, params, weights)
    ret_fn = lambda x, d: win_mod.retract_all(x, d, cfg)

    spec = lm_mod.SchurSpec(dense_dim=cfg.nd, n_scalar=cfg.max_points,
                            n_block4=cfg.max_lines)
    layout = lm_mod.WindowLayout(nd=cfg.nd, nf=cfg.nf, P=cfg.max_points,
                                 L=cfg.max_lines)
    out_g = jax.jit(
        lambda: lm_mod.lm_solve(res_fn, ret_fn, x0, spec,
                                lm_mod.LMConfig(num_iters=5))
    )()
    out_s = jax.jit(
        lambda: lm_mod.lm_solve_window(res_fn, ret_fn, x0, layout,
                                       lm_mod.LMConfig(num_iters=5))
    )()
    assert float(out_s.cost) < float(out_s.cost0)
    np.testing.assert_allclose(
        float(out_s.cost), float(out_g.cost), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_s.x[0].p), np.asarray(out_g.x[0].p), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_s.x[1]), np.asarray(out_g.x[1]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_s.x[2]), np.asarray(out_g.x[2]), atol=1e-6
    )
